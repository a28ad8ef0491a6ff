"""Pallas TPU kernel: fused four-step FFT -> half-spectrum magnitudes.

One kernel pass per window tile, entirely VMEM-resident: DFT over the m1 axis
as an MXU matmul against a precomputed N1-point DFT matrix, twiddle multiply,
DFT over the m2 axis as a second MXU matmul, then |.| of the positive-
frequency half - with no HBM round-trips between stages.  Twiddle/DFT tables
are built in float64 at trace time (vs. the reference's error-accumulating
``w *= w_m``).

Status: RETIRED from the performance path (kept as a correct, tested
alternative and kernel-path demonstration).  Measured on TPU v5e at
B=2048/N=4096: 0.95-1.01 ms vs 0.47-0.55 ms for the XLA-scheduled matmul
backend (round 1), and the round-2 fused variant (adding threshold +
local-max candidate stats in-kernel, VERDICT item 6) measured 1.11 ms vs
0.59 ms for the equivalent XLA front end - decision-exact both times, but
XLA's scheduling of the same MXU matmuls wins at these sizes.  See
docs/DESIGN.md "Fused-kernel experiment".

Mosaic layout constraints shape the data flow: the lane (minor) dimension can
never be split or merged inside the kernel, so the wrapper hands the kernel a
pre-shaped ``[B, N2, N1]`` view (m2-major), the kernel only merges/splits
*major* dims plus one minor-dims transpose between the two matmuls, and the
output leaves as ``[B, N1, N2/2]`` for the wrapper to flatten.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from apda_fft_tpu.ops.fft import _dft_tables, _twiddle_tables, is_pow2, split_pow2


def _fused_kernel(x_ref, c1_ref, s1_ref, twc_ref, tws_ref, c2_ref, s2_ref, out_ref,
                  *, n1: int, n2: int):
    tb = x_ref.shape[0]
    # x_ref block: (TB, N2, N1) - window m2-major. Merge major dims for MXU.
    a = x_ref[:].reshape(tb * n2, n1)
    # DFT matrices are symmetric (W^{jk} = W^{kj}): right-multiply contracts m1.
    br = jnp.dot(a, c1_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    bi = jnp.dot(a, s1_ref[:], preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)

    # Twiddle W_N^{k1*m2}, tables stored transposed as [N2, N1].
    br3 = br.reshape(tb, n2, n1)
    bi3 = bi.reshape(tb, n2, n1)
    twc = twc_ref[:]
    tws = tws_ref[:]
    cr = br3 * twc - bi3 * tws
    ci = br3 * tws + bi3 * twc

    # Step 3 contracts m2: transpose minor dims to (TB, N1, N2).
    cr2 = jnp.transpose(cr, (0, 2, 1)).reshape(tb * n1, n2)
    ci2 = jnp.transpose(ci, (0, 2, 1)).reshape(tb * n1, n2)
    c2m = c2_ref[:]
    s2m = s2_ref[:]
    dr = jnp.dot(cr2, c2m, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) - jnp.dot(
        ci2, s2m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    di = jnp.dot(cr2, s2m, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) + jnp.dot(
        ci2, c2m, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )

    # Positive half: k = k1 + N1*k2 < N/2  <=>  k2 < N2/2 (all k1).
    mag2 = dr * dr + di * di
    mag = jnp.sqrt(mag2).reshape(tb, n1, n2)[:, :, : n2 // 2]
    # Zero the DC bin k1 = k2 = 0 (fft_iterativa.py:85 parity).
    row = jax.lax.broadcasted_iota(jnp.int32, mag.shape, dimension=1)
    col = jax.lax.broadcasted_iota(jnp.int32, mag.shape, dimension=2)
    out_ref[:] = jnp.where((row == 0) & (col == 0), jnp.float32(0), mag)


@functools.partial(jax.jit, static_argnames=("block_windows", "interpret"))
def halfspec_magnitudes_pallas(
    x: jnp.ndarray, block_windows: int = 16, interpret: bool | None = None
) -> jnp.ndarray:
    """|FFT| of the first N/2 bins for real windows ``x`` [B, N], DC zeroed.

    Drop-in equivalent of ``halfspec_magnitudes(..., backend="xla")`` for
    float32 inputs.  ``interpret`` defaults to True off-TPU so tests run on
    the CPU mesh.
    """
    if x.ndim != 2:
        raise ValueError(f"expected [B, N] windows, got shape {x.shape}")
    b, n = x.shape
    if not is_pow2(n) or n < 64:
        raise ValueError(f"window length must be a power of two >= 64, got {n}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = x.astype(jnp.float32)

    n1, n2 = split_pow2(n)
    c1, s1 = (jnp.asarray(t) for t in _dft_tables(n1, "float32"))
    c2, s2 = (jnp.asarray(t) for t in _dft_tables(n2, "float32"))
    twc, tws = (jnp.asarray(t.T.copy()) for t in _twiddle_tables(n1, n2, "float32"))

    tb = min(block_windows, b) if b else block_windows
    pad = (-b) % tb
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    bp = x.shape[0]
    # Pre-shape to (B, N2, N1): lane-dim splits are illegal inside the kernel.
    x3 = x.reshape(bp, n1, n2).swapaxes(1, 2)

    table_spec = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    out3 = pl.pallas_call(
        functools.partial(_fused_kernel, n1=n1, n2=n2),
        grid=(bp // tb,),
        in_specs=[
            pl.BlockSpec((tb, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            table_spec((n1, n1)),
            table_spec((n1, n1)),
            table_spec((n2, n1)),
            table_spec((n2, n1)),
            table_spec((n2, n2)),
            table_spec((n2, n2)),
        ],
        out_specs=pl.BlockSpec(
            (tb, n1, n2 // 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bp, n1, n2 // 2), jnp.float32),
        interpret=interpret,
    )(x3, c1, s1, twc, tws, c2, s2)
    # k = k1 + N1*k2: flatten k2-major outside the kernel.
    return out3.swapaxes(1, 2).reshape(bp, n // 2)[:b]
