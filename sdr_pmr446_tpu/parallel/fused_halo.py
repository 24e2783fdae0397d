"""Cross-shard state composition for the FUSED Pallas engine.

The flagship engine fuses the one-pole DC blockers INSIDE its kernels
(IQ blocker in the front end, CTCSS-branch blocker in the audio bank), so
the classic halo recipe (materialize the op's output, ppermute its tail,
compose the IIR carry on the plane — parallel/halo.py) has nothing to
attach to: the DC-blocked planes never exist in HBM.

The sharded fused step instead exploits that everything downstream of a
one-pole is AFFINE in its incoming state:

  1. every shard runs the UNMODIFIED kernel with zero incoming y (the
     x[-1] half of the state is exact via a 1-sample halo, or folded into
     the same correction);
  2. the kernel's own carried-state outputs ARE the zero-init affine
     summaries (final y from zero state; final x is state-independent);
  3. one tiny all_gather + a D-step replicated fold recovers each shard's
     TRUE incoming y — and the error everywhere else is exactly
     delta * p^n, a geometric ramp;
  4. the ramp is pushed through the (linear) resampler as a precomputed
     constant and added to the band planes (front end), or through the
     (linear) CTCSS DFT as precomputed geometric-phasor sums and added to
     the [K, 38] tone sums (audio bank) — bytes touched: one band-plane
     pass + crumbs, instead of re-materializing any DC plane.

Same reference anchor as parallel/halo.py: the whole chain is one
stateful stream in C (src/sdr_pmr446.c:788-931); these helpers carry that
stream's state across a time-sharded mesh for the kernels the single-chip
bench actually records.

Exactness: corrections are computed in float64 on host (constants) and
applied as single f32 mul-adds, so the sharded band differs from the
unsharded kernel's at f32 rounding (~1e-6 relative — the same class as
the group-vs-row band gate, tests/test_group_band.py); chain decisions
and CTCSS events are exact on the test signals (test-enforced).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from sdr_pmr446_tpu import config as C

_P = 1.0 - C.DC_BLOCK_ALPHA
_G = (1.0 + _P) / 2.0


# ---------------------------------------------------------------------------
# generic shard plumbing
# ---------------------------------------------------------------------------

def _perm_right(num: int):
    return [(i, i + 1) for i in range(num - 1)]


def shard_pass_right(carried, val, axis: str):
    """Each shard receives its LEFT neighbor's ``val`` (shard 0 receives
    ``carried``); returns (received, new_carried = last shard's val)."""
    num = jax.lax.axis_size(axis)
    if num == 1:
        return carried, val
    d = jax.lax.axis_index(axis)
    left = jax.lax.ppermute(val, axis, _perm_right(num))
    recv = jnp.where(d == 0, carried, left)
    new_carried = last_shard(val, axis)
    return recv, new_carried


def last_shard(val, axis: str):
    """The LAST shard's ``val``, replicated to all shards."""
    num = jax.lax.axis_size(axis)
    if num == 1:
        return val
    d = jax.lax.axis_index(axis)
    return jax.lax.psum(
        jnp.where(d == num - 1, val, jnp.zeros_like(val)), axis)


def compose_dc_chain(y0_end, x_last, carried_y, carried_x,
                     p_t1: float, g: float, axis: str):
    """Recover each shard's TRUE incoming one-pole state from zero-init
    kernel runs of y[n] = g*(x[n] - x[n-1]) + p*y[n-1].

    y0_end: this shard's kernel-returned final y, computed with incoming
    (x[-1]=0, y[-1]=0); x_last: this shard's true last input (exact,
    state-independent).  ``p_t1`` = p^(T-1) with T the shard's sample
    count; ``g`` = the recurrence's b1 magnitude (pass 0.0 when the
    kernel already received the true x[-1] via a 1-sample halo).

    The run-with-zero error is exactly delta * p^n with
    delta = p*y_in - g*x_in (n = local sample index), so
    y_true_end = y0_end + delta * p^(T-1) — a D-step fold over the
    gathered per-shard endpoints, computed replicated (D <= mesh axis,
    a handful of scalar ops).

    Returns (y_in, delta, new_carried_y, new_carried_x) for THIS shard
    (new_carried_* replicated: the stream state entering the next step).
    """
    num = jax.lax.axis_size(axis)
    p = jnp.asarray(_P, y0_end.dtype if y0_end.dtype.kind == "c"
                    else jnp.float32)
    if num == 1:
        delta = p * carried_y - g * carried_x
        y_fin = y0_end + delta * p_t1
        return carried_y, delta, y_fin, x_last
    d = jax.lax.axis_index(axis)
    ye = jax.lax.all_gather(y0_end, axis)                  # [D, ...]
    xl = jax.lax.all_gather(x_last, axis)
    x_in_seq = jnp.concatenate([carried_x[None], xl[:-1]], axis=0)

    def fold(y_in, inp):
        ye_d, xi_d = inp
        delta = p * y_in - g * xi_d
        y_out = ye_d + delta * p_t1
        return y_out, (y_in, delta)

    y_fin, (y_ins, deltas) = jax.lax.scan(fold, carried_y, (ye, x_in_seq))
    y_in = jax.lax.dynamic_index_in_dim(y_ins, d, keepdims=False)
    delta = jax.lax.dynamic_index_in_dim(deltas, d, keepdims=False)
    new_carried_x = xl[-1]
    return y_in, delta, y_fin, new_carried_x


# ---------------------------------------------------------------------------
# front-end (fused IQ DC blocker + resampler) correction constants
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def front_end_consts(t_local: int, hist_len: int) -> dict:
    """Correction constants for a zero-state fused-front-end shard run.

    With the kernel given the true x[-1] (1-sample halo) and y[-1] = 0,
    its DC output is low by y_in * p^(n+1) (n = local input index) and
    its resampler windows miss the history block entirely.  Both errors
    are linear, so the band correction is

        band += y_in * gvec  +  Mh^T @ hist_true          (per plane)

    with (all float64 on host, rounded once):
      gvec [G_local, 400]: the resampler applied to the ramp p^(n+1)
        with zero history — geometric beyond the first 3 frame rows;
      mh   [hist_len, 75]: the resampler's response to the history block
        (only frames 0..2 reach it, k2's own left-pad convention);
      tail_ramp [hist_len]: p^(n+1) at the tail positions (corrects the
        kernel's carried-history output before it ppermutes right);
      p_t: p^T (the carried-y decay across the whole shard);
      p_t1: p^(T-1) (compose_dc_chain's endpoint factor).

    k2 is the front-end kernel's own [512, 25] polyphase matrix
    (kernels/front_end.py::_row_consts) — the correction is the same
    arithmetic the kernel would have done, split out by linearity.
    """
    from sdr_pmr446_tpu.kernels.front_end import _row_consts, L, M, W_PAD
    k2 = _row_consts()["k2"].astype(np.float64)            # [512, 25]
    p = np.float64(_P)
    assert t_local % (16 * M) == 0
    rows = t_local // M
    g_local = rows // 16

    j = np.arange(W_PAD, dtype=np.float64)
    kappa = (k2 * (p ** j)[:, None]).sum(axis=0)           # [25]
    gv = np.zeros((rows, L), dtype=np.float64)
    for r in range(min(3, rows)):
        lo = M * (3 - r)                                   # ramp starts here
        w = p ** np.maximum(j - lo + 1.0, 0.0)
        w[j < lo] = 0.0
        gv[r] = (k2 * w[:, None]).sum(axis=0)
    if rows > 3:
        rr = np.arange(3, rows, dtype=np.float64)
        gv[3:] = (p ** (M * (rr - 3) + 1.0))[:, None] * kappa[None, :]
    gvec = gv.reshape(g_local, 16 * L).astype(np.float32)

    mh = np.zeros((hist_len, 3 * L), dtype=np.float64)
    for r in range(3):
        for h in range(hist_len):
            jj = h - hist_len + 3 * M - M * r
            if 0 <= jj < W_PAD:
                mh[h, L * r:L * (r + 1)] = k2[jj]
    n_tail = np.arange(t_local - hist_len, t_local, dtype=np.float64)
    tail_ramp = (p ** (n_tail + 1.0)).astype(np.float32)
    return dict(gvec=gvec, mh=mh.astype(np.float32), tail_ramp=tail_ramp,
                p_t=float(p ** t_local), p_t1=float(p ** (t_local - 1)))


def correct_band(bw, y_in_plane, hist_plane, consts):
    """bw [G, 400] one plane of the zero-state kernel's band; y_in_plane
    f32 scalar (re or im of the composed incoming dc y); hist_plane
    [hist_len] f32 (the TRUE incoming resampler history, same plane).
    Returns the corrected plane."""
    head = jnp.matmul(hist_plane[None, :], jnp.asarray(consts["mh"]),
                      precision=jax.lax.Precision.HIGHEST)[0]     # [75]
    corr = y_in_plane * jnp.asarray(consts["gvec"])
    corr = corr.at[0, : head.shape[0]].add(head)
    return bw + corr


# ---------------------------------------------------------------------------
# DUO (front+PFB one-kernel) sharding: exact-state pre-pass
# ---------------------------------------------------------------------------
#
# The duo kernel never materializes the band, so the zero-init +
# band-correction recipe above has nothing to correct (the PFB's atan2 is
# past the linear stages).  Instead a READ-ONLY pre-pass computes each
# shard's zero-state DC summaries without materializing any [T] plane:
# per-128-row weighted reductions (two matmuls per plane) + a [rows]
# first-order fold.  compose_dc_chain then yields the TRUE incoming
# (x[-1], y[-1]) — fed straight to the unmodified kernel — and the
# outgoing halo values (resampler-history tail, PFB band row, last-frame
# candidate) are rebuilt from a short corrected DC tail pushed through the
# XLA resampler (a ~2.5k-sample computation per shard).

@functools.lru_cache(maxsize=None)
def dc_row_weights() -> np.ndarray:
    """[128] f32: end-of-row zero-state DC response to in-row samples,
    G-scaled —   sum_j' p^(127-j') g (x[j'] - x[j'-1])  as weights on
    x[j].  Shared by the XLA pre-pass reduction below and the wire-direct
    summary kernel (kernels/summary.py)."""
    p = np.float64(_P)
    j = np.arange(128, dtype=np.float64)
    v = np.where(j < 127, p ** (127.0 - j) - p ** (126.0 - j), 1.0)
    return (np.float64(_G) * v).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _zero_summary_consts(t_local: int, tail_len: int) -> dict:
    """Host-float64 constants for front_zero_summary."""
    p = np.float64(_P)
    rows = t_local // 128
    r = np.arange(rows, dtype=np.float64)
    pr_last = (p ** (128.0 * (rows - 1 - r)))          # fold to final y
    tail_rows = tail_len // 128
    # correction ramp at the tail positions: p^n, n = T - tail_len + j
    n_tail = np.arange(tail_len, dtype=np.float64) + (t_local - tail_len)
    return dict(v=dc_row_weights(),
                gp127=np.float32(_G * p ** 127.0),
                p128=float(p ** 128.0),
                pr_last=pr_last.astype(np.float32),
                rows=rows, tail_rows=tail_rows,
                tail_ramp=(p ** n_tail).astype(np.float32),
                p_t1=float(p ** (t_local - 1.0)))


def fold_row_summaries(w: jax.Array, xl_col: jax.Array, t_local: int,
                       tail_len: int):
    """The [rows]-level first-order fold shared by the pre-pass variants:
    w [2, R] = per-row G-weighted zero-state responses (dc_row_weights),
    xl_col [2, R] = each row's last sample.  Returns
    (y00, y_pre, x_pre, xlast) — see front_zero_summary."""
    from sdr_pmr446_tpu.ops import iir
    cc = _zero_summary_consts(t_local, tail_len)
    rows = cc["rows"]
    prev_last = jnp.concatenate(
        [jnp.zeros((2, 1), xl_col.dtype), xl_col[:, :-1]], axis=1)
    t_r = w - cc["gp127"] * prev_last
    b = iir.first_order_scan(t_r, cc["p128"],
                             jnp.zeros((2,), t_r.dtype))         # [2, R]
    y00 = jax.lax.complex(b[0, rows - 1], b[1, rows - 1])
    tr = cc["tail_rows"]
    y_pre = jax.lax.complex(b[0, rows - tr - 1], b[1, rows - tr - 1])
    x_pre = jax.lax.complex(xl_col[0, rows - tr - 1],
                            xl_col[1, rows - tr - 1])
    xlast = jax.lax.complex(xl_col[0, rows - 1], xl_col[1, rows - 1])
    return y00, y_pre, x_pre, xlast


def front_zero_summary(xr: jax.Array, xi: jax.Array, tail_len: int):
    """Zero-state ((x[-1], y[-1]) = 0) DC-blocker summaries of a shard's
    input planes xr/xi [T] (T % 128 == 0, tail_len % 128 == 0):

    returns (y00, y_pre, x_pre, xlast, tail_x) with y00 = zero-state
    final y (c64), y_pre = zero-state y at T - tail_len - 1, x_pre =
    x[T - tail_len - 1], xlast = x[T - 1], tail_x [tail_len] c64 = the
    RAW input tail (for the subsequent short DC scan).  One read pass;
    nothing [T]-sized is written."""
    t = xr.shape[-1]
    cc = _zero_summary_consts(t, tail_len)
    rows = cc["rows"]
    v = jnp.asarray(cc["v"])[:, None]
    hi = jax.lax.Precision.HIGHEST
    # per-plane reductions on free [rows, 128] views — no [2, T] stack is
    # ever materialized (this pre-pass must stay a single read of x)
    xr2 = xr.reshape(rows, 128)
    xi2 = xi.reshape(rows, 128)
    w = jnp.stack([jnp.matmul(xr2, v, precision=hi)[..., 0],
                   jnp.matmul(xi2, v, precision=hi)[..., 0]])    # [2, R]
    xl_col = jnp.stack([xr2[:, 127], xi2[:, 127]])               # [2, R]
    y00, y_pre, x_pre, xlast = fold_row_summaries(w, xl_col, t, tail_len)
    tail_x = jax.lax.complex(xr[t - tail_len:], xi[t - tail_len:])
    return y00, y_pre, x_pre, xlast, tail_x


def front_zero_summary_wire(wire: jax.Array, fmt: str, t_local: int,
                            tail_len: int, interpret: bool = False):
    """Wire-direct front_zero_summary: the sharded pre-pass WITHOUT ever
    materializing the decoded [T] planes.  ``wire`` is the shard's packed
    transport rows (the same 2-D layout the duo kernel consumes); a tiny
    read-only Pallas kernel (kernels/summary.py) decodes in VMEM and
    emits only the [rows, 4|8] summary columns, and the RAW tail is
    decoded separately from the wire's last rows (tail_len samples —
    [T]-independent).  Saves the decode's plane write + re-read
    (~16 B/sample of sharded-only HBM traffic for packed formats)."""
    from sdr_pmr446_tpu.kernels.summary import zero_summary_wire
    from sdr_pmr446_tpu.ops import decode as decode_op
    w, xl_col = zero_summary_wire(wire, fmt, interpret=interpret)
    y00, y_pre, x_pre, xlast = fold_row_summaries(w, xl_col, t_local,
                                                  tail_len)
    spw = {"cf32w": 128, "cs16": 128, "cu8": 256, "cs8": 256}[fmt]
    tail_rows = -(-tail_len // spw)            # ceil: dsd's 7040-sample
    xr_t, xi_t = decode_op.decode_planes(      # tail is 27.5 wide rows
        wire[wire.shape[0] - tail_rows:].reshape(-1), fmt)
    tail_x = jax.lax.complex(xr_t[-tail_len:], xi_t[-tail_len:])
    return y00, y_pre, x_pre, xlast, tail_x


def dc_tail_exact(tail_x: jax.Array, y_pre, x_pre, delta, t_local: int):
    """The TRUE DC-blocked input tail: a short scan from the zero-state
    boundary values plus the delta * p^n correction (delta from
    compose_dc_chain; exact affine identity)."""
    from sdr_pmr446_tpu.ops import iir
    tail_len = tail_x.shape[-1]
    cc = _zero_summary_consts(t_local, tail_len)
    xs = jnp.stack([jnp.real(tail_x), jnp.imag(tail_x)])
    xprev = jnp.concatenate(
        [jnp.stack([jnp.real(x_pre), jnp.imag(x_pre)])[:, None],
         xs[:, :-1]], axis=1)
    z = _G * (xs - xprev)
    y0 = jnp.stack([jnp.real(y_pre), jnp.imag(y_pre)])
    y00_tail = iir.first_order_scan(z, _P, y0)          # [2, tail]
    ramp = jnp.asarray(cc["tail_ramp"])
    dcol = jnp.stack([jnp.real(delta), jnp.imag(delta)])[:, None]
    y_true = y00_tail + dcol * ramp[None, :]
    return jax.lax.complex(y_true[0], y_true[1])


# ---------------------------------------------------------------------------
# audio-bank (fused CTCSS-branch DC blocker + DFT) correction constants
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def ctcss_corr_consts(k_local: int, ns: int) -> dict:
    """Geometric-phasor sums for correcting a zero-lp-DC-state shard's
    in-kernel tone sums.

    The lp DC error in channel ch is delta_ch * p^pos (pos = local audio
    index), so the error in the kernel's raw DFT sums (which weight by
    E[t, pos] = e^{-j w_t pos}) is delta * zeta^pos with
    zeta_t = p * e^{-j w_t}:

      raw_mem[k] += delta_sel * zpow[k] * zc[ns]
      raw_pre[k] += delta_sel * zpow[k] * zc[min(b, ns-1) + 1]

    (pre sums lanes j <= b inclusive, matching the kernel's w0p mask and
    ctcss_subchunk_sums' ``idx <= b``).  All host float64.
    """
    w = 2.0 * np.pi * np.asarray(C.CTCSS_FREQS, np.float64) \
        / C.AUDIO_SAMPLERATE
    zeta = _P * np.exp(-1j * w)                            # [38] c128
    zpow = zeta[None, :] ** (ns * np.arange(k_local,
                                            dtype=np.float64))[:, None]
    # zc[m, t] = sum_{j < m} zeta^j   (zc[0] = 0)
    zc = np.concatenate([np.zeros((1, w.shape[0]), np.complex128),
                         np.cumsum(zeta[None, :] **
                                   np.arange(ns,
                                             dtype=np.float64)[:, None],
                                   axis=0)], axis=0)       # [ns+1, 38]
    t_a = k_local * ns
    return dict(zpow=zpow.astype(np.complex64), zc=zc.astype(np.complex64),
                p_t1=float(_P ** (t_a - 1.0)))


def correct_raw_sums(raw_pre, raw_mem, delta_sel, b_loc, consts, ns: int):
    """Apply the zero-lp-DC-state correction to a shard's local kernel
    tone sums.  raw_pre/raw_mem [K_local, 38] c64; delta_sel [K_local]
    f32 (delta of each sub-chunk's SELECTED channel); b_loc [K_local] i32
    window boundaries (sched.b_arr's local slice)."""
    zpow = jnp.asarray(consts["zpow"])                     # [K_local, 38]
    zc = jnp.asarray(consts["zc"])                         # [ns+1, 38]
    b_eff = jnp.clip(b_loc, 0, ns - 1) + 1                 # lanes j <= b
    d_c = delta_sel.astype(jnp.complex64)[:, None]
    pre = raw_pre + d_c * zpow * zc[b_eff]
    mem = raw_mem + d_c * zpow * zc[ns][None, :]
    return pre, mem
