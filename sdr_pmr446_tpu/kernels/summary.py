"""Read-only zero-state DC summary kernel: wire rows in, tiny sums out.

The sharded DUO/MONO engines' exact-state pre-pass
(parallel/fused_halo.py) needs, per 128-sample row r of a shard's
input and per I/Q plane: the zero-state DC-blocker end-of-row response
w[r] = sum_j G*v[j] * x[r, j]  (v = fused_halo.dc_row_weights) and the
row's last sample x[r, 127].  The XLA formulation decodes the wire to
planes first (ops/decode.py) and XLA materializes both [T] planes in
HBM before the reduction matmuls read them back (~16 B/input-sample of
sharded-only traffic).  This kernel reads the WIRE once, decodes in
VMEM with the exact same bit arithmetic as the front-end/duo kernels
(kernels/front_end.py::_decode_cs16/_decode_bytes — bit-exact vs
ops/decode.py, test-enforced there), and emits only [rows, 4|8] f32
summary columns: HBM traffic = one wire read + crumbs.

Per-format column extraction (value slices at non-128 lane offsets are
illegal — columns come out of MXU selector matmuls, CLAUDE.md):

  cf32w  rows [r, 256] interleave re/im: ONE [256, 4] matmul whose
         columns are (v at even lanes, v at odd lanes, e_254, e_255)
         yields (w_re, w_im, xl_re, xl_im) per row.
  cs16   decode to [r, 128] planes, one shared [128, 2] matrix
         (v, e_127) per plane.
  cu8 /  each wide row = TWO 128-sample summary rows: words 0..63 hold
  cs8    row 2r (byte planes b0/b1 = even-sample re/im, b2/b3 = odd),
         words 64..127 hold row 2r+1 — masked weight splits
         (va = even-lane weights low/high, vb = odd low/high) and the
         last sample is odd (e_63 / e_127 on b2/b3).

Reference anchor: this serves the time-sharded execution of the single
stateful C stream (src/sdr_pmr446.c:788-931); the summaries themselves
have no reference counterpart (the C chain is sequential).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdr_pmr446_tpu.kernels import front_end as FE


@functools.lru_cache(maxsize=None)
def _consts(fmt: str) -> tuple[np.ndarray, ...]:
    from sdr_pmr446_tpu.parallel.fused_halo import dc_row_weights
    v = dc_row_weights().astype(np.float32)              # [128]
    if fmt == "cf32w":
        k = np.zeros((256, 4), np.float32)
        k[0::2, 0] = v                                   # w_re
        k[1::2, 1] = v                                   # w_im
        k[254, 2] = 1.0                                  # xl_re
        k[255, 3] = 1.0                                  # xl_im
        return (k,)
    if fmt == "cs16":
        k = np.zeros((128, 2), np.float32)
        k[:, 0] = v                                      # w
        k[127, 1] = 1.0                                  # xl
        return (k,)
    # cu8/cs8 wide rows: word k holds samples (2k, 2k+1); summary row 2r
    # uses words 0..63, row 2r+1 words 64..127
    va = np.zeros((128, 2), np.float32)                  # even-sample w
    vb = np.zeros((128, 2), np.float32)                  # odd-sample w
    kk = np.arange(64)
    va[kk, 0] = v[2 * kk]
    vb[kk, 0] = v[2 * kk + 1]
    va[64 + kk, 1] = v[2 * kk]
    vb[64 + kk, 1] = v[2 * kk + 1]
    e2 = np.zeros((128, 2), np.float32)                  # last samples
    e2[63, 0] = 1.0                                      # row 2r:  x[127]
    e2[127, 1] = 1.0                                     # row 2r+1: x[255]
    return (va, vb, e2)


def _body_ilv(xw_ref, k_ref, out_ref):
    out_ref[:, :] = FE._dot(xw_ref[:], k_ref[:])


def _body_cs16(xw_ref, k_ref, out_ref):
    xr, xi = FE._decode_cs16(xw_ref[:])
    out_ref[:, 0:2] = FE._dot(xr, k_ref[:])              # w_re, xl_re
    out_ref[:, 2:4] = FE._dot(xi, k_ref[:])              # w_im, xl_im


def _body_pk2(xw_ref, va_ref, vb_ref, e2_ref, out_ref, *, signed):
    b0, b1, b2, b3 = FE._decode_bytes(xw_ref[:], signed)
    out_ref[:, 0:2] = FE._dot(b0, va_ref[:]) + FE._dot(b2, vb_ref[:])
    out_ref[:, 2:4] = FE._dot(b1, va_ref[:]) + FE._dot(b3, vb_ref[:])
    out_ref[:, 4:6] = FE._dot(b2, e2_ref[:])             # xl_re x2 rows
    out_ref[:, 6:8] = FE._dot(b3, e2_ref[:])             # xl_im x2 rows


def zero_summary_wire(wire: jax.Array, fmt: str, tile_rows: int = 448,
                      interpret: bool = False):
    """wire [rows_w, width] f32 transport rows -> (w [2, R], xl [2, R])
    f32, R = 128-sample summary rows (rows_w for cf32w/cs16, 2*rows_w
    for the wide formats)."""
    assert fmt in ("cf32w", "cs16", "cu8", "cs8"), fmt
    rows_w, width = wire.shape
    tile = FE.pick_tile(rows_w, tile_rows)
    n_cols = 8 if fmt in ("cu8", "cs8") else 4
    consts = _consts(fmt)
    if fmt == "cf32w":
        assert width == 256
        body = _body_ilv
    elif fmt == "cs16":
        assert width == 128
        body = _body_cs16
    else:
        assert width == 128
        body = functools.partial(_body_pk2, signed=fmt == "cs8")
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        body,
        grid=(rows_w // tile,),
        in_specs=[pl.BlockSpec((tile, width), lambda s: (s, 0),
                               memory_space=pltpu.VMEM)]
        + [vmem()] * len(consts),
        out_specs=pl.BlockSpec((tile, n_cols), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_w, n_cols), jnp.float32),
        interpret=interpret,
    )(wire, *(jnp.asarray(c) for c in consts))
    if fmt == "cf32w":
        w = jnp.stack([out[:, 0], out[:, 1]])
        xl = jnp.stack([out[:, 2], out[:, 3]])
    elif fmt == "cs16":
        w = jnp.stack([out[:, 0], out[:, 2]])
        xl = jnp.stack([out[:, 1], out[:, 3]])
    else:
        w = jnp.stack([out[:, 0:2].reshape(-1), out[:, 2:4].reshape(-1)])
        xl = jnp.stack([out[:, 4:6].reshape(-1), out[:, 6:8].reshape(-1)])
    return w, xl
