"""Unit tests for the cross-shard composition machinery of the fused
engines (parallel/fused_halo.py) — the e2e sharded==unsharded gates live
in tests/test_sharding.py; these pin the pre-pass algebra directly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.parallel import fused_halo as FH


def _dc_scan(x, x_in=0.0 + 0.0j, y_in=0.0 + 0.0j):
    """Ground-truth one-pole: y[n] = g(x[n]-x[n-1]) + p y[n-1]."""
    p = 1.0 - C.DC_BLOCK_ALPHA
    g = (1.0 + p) / 2.0
    y = np.empty_like(x)
    xp, yp = x_in, y_in
    for n in range(len(x)):
        y[n] = g * (x[n] - xp) + p * yp
        xp, yp = x[n], y[n]
    return y


def test_front_zero_summary_matches_scan():
    """y00 / y_pre from the read-only reduction == the zero-state scan's
    values at T-1 and T-tail-1 (float64 ground truth, f32 gate)."""
    rng = np.random.default_rng(0)
    t = 4 * 2048
    tail = 1024
    x = (rng.standard_normal(t) + 1j * rng.standard_normal(t)) * 0.3
    y_ref = _dc_scan(x.astype(np.complex128))

    y00, y_pre, x_pre, xlast, tail_x = FH.front_zero_summary(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        tail)
    np.testing.assert_allclose(complex(y00), y_ref[-1], rtol=0, atol=2e-5)
    np.testing.assert_allclose(complex(y_pre), y_ref[t - tail - 1],
                               rtol=0, atol=2e-5)
    assert complex(x_pre) == complex(np.complex64(x[t - tail - 1]))
    assert complex(xlast) == complex(np.complex64(x[-1]))
    np.testing.assert_allclose(np.asarray(tail_x),
                               x[-tail:].astype(np.complex64))


def test_dc_tail_exact_matches_true_state_scan():
    """The corrected tail == the TRUE-state scan over the whole block
    (the zero-state trajectory plus delta * p^n is the exact affine
    identity)."""
    rng = np.random.default_rng(1)
    t = 4 * 2048
    tail = 1024
    x = (rng.standard_normal(t) + 1j * rng.standard_normal(t)) * 0.3
    x_in = 0.21 - 0.08j
    y_in = -0.05 + 0.33j
    y_true = _dc_scan(x.astype(np.complex128), x_in, y_in)

    y00, y_pre, x_pre, xlast, tail_x = FH.front_zero_summary(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        tail)
    p = 1.0 - C.DC_BLOCK_ALPHA
    g = (1.0 + p) / 2.0
    delta = jnp.complex64(p * y_in - g * x_in)
    got = np.asarray(FH.dc_tail_exact(tail_x, y_pre, x_pre, delta, t))
    np.testing.assert_allclose(got, y_true[-tail:].astype(np.complex64),
                               rtol=0, atol=5e-5)


def test_compose_dc_chain_single_shard():
    """num==1 fast path (under a 1-device shard_map): y_in is the
    carried state; the returned final y equals the true end-of-block
    state."""
    from jax.sharding import Mesh, PartitionSpec as P
    rng = np.random.default_rng(2)
    t = 2048
    x = (rng.standard_normal(t) + 1j * rng.standard_normal(t)) * 0.3
    x_in = 0.4 + 0.1j
    y_in = -0.2 + 0.05j
    y_true = _dc_scan(x.astype(np.complex128), x_in, y_in)

    y00, _, _, xlast, _ = FH.front_zero_summary(
        jnp.asarray(x.real, jnp.float32), jnp.asarray(x.imag, jnp.float32),
        256)
    p = 1.0 - C.DC_BLOCK_ALPHA
    p_t1 = float(np.float64(p) ** (t - 1))

    def body(ye, xl, cy, cx):
        return FH.compose_dc_chain(ye, xl, cy, cx, p_t1, FH._G, "t1")

    mesh = Mesh(np.asarray(jax.devices()[:1]), ("t1",))
    yin_got, delta, y_fin, xl = jax.shard_map(
        body, mesh=mesh, in_specs=(P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()), check_vma=False)(
        y00, xlast, jnp.complex64(y_in), jnp.complex64(x_in))
    np.testing.assert_allclose(complex(yin_got), y_in, atol=1e-6)
    np.testing.assert_allclose(complex(y_fin), y_true[-1], atol=2e-5)


def test_compose_dc_chain_two_shards_fold():
    """The D-step fold reproduces a sequential two-block scan's incoming
    states: shard 1's y_in == the true end-of-block-0 state."""
    rng = np.random.default_rng(3)
    t = 2048
    xs = [(rng.standard_normal(t) + 1j * rng.standard_normal(t)) * 0.3
          for _ in range(2)]
    x_in = 0.1 - 0.3j
    y_in = 0.25 + 0.15j
    y0_true = _dc_scan(xs[0].astype(np.complex128), x_in, y_in)
    y1_true = _dc_scan(xs[1].astype(np.complex128), xs[0][-1], y0_true[-1])

    # emulate the replicated fold directly (no mesh needed): the fold is
    # plain lax.scan over gathered endpoints
    p = 1.0 - C.DC_BLOCK_ALPHA
    p_t1 = float(np.float64(p) ** (t - 1))
    ye, xl = [], []
    for x in xs:
        y00, _, _, xlast, _ = FH.front_zero_summary(
            jnp.asarray(x.real, jnp.float32),
            jnp.asarray(x.imag, jnp.float32), 256)
        ye.append(complex(y00))
        xl.append(complex(xlast))
    g = FH._G
    y_cur = y_in
    x_cur = x_in
    y_ins = []
    for d in range(2):
        delta = p * y_cur - g * x_cur
        y_out = ye[d] + delta * p_t1
        y_ins.append(y_cur)
        y_cur, x_cur = y_out, xl[d]
    np.testing.assert_allclose(y_ins[1], y0_true[-1], atol=3e-5)
    np.testing.assert_allclose(y_cur, y1_true[-1], atol=3e-5)


@pytest.mark.parametrize("fmt", ["cf32w", "cs16", "cu8", "cs8"])
def test_zero_summary_wire_matches_plane_path(fmt):
    """The wire-direct summary kernel (kernels/summary.py — in-VMEM
    decode, only [rows, 4|8] columns leave) == decode_planes +
    front_zero_summary on the same wire bytes: y00/y_pre to f32 matmul
    reordering, x samples and the raw tail EXACT."""
    from sdr_pmr446_tpu.ops import decode as decode_op
    rng = np.random.default_rng(7)
    t = 8 * 2048
    tail = 2560
    x = (rng.standard_normal(t) + 1j * rng.standard_normal(t)) * 0.2
    if fmt == "cf32w":
        w = np.empty(2 * t, np.float32)
        w[0::2] = x.real
        w[1::2] = x.imag
        wire = jnp.asarray(w.reshape(t // 128, 256))
    else:
        packed = decode_op.pack_iq(x, fmt)
        spw = 128 if fmt == "cs16" else 256
        wire = jnp.asarray(packed.reshape(t // spw, -1))
    xr, xi = decode_op.decode_planes(wire.reshape(-1), fmt)
    ref = FH.front_zero_summary(xr, xi, tail)
    out = FH.front_zero_summary_wire(wire, fmt, t, tail, interpret=True)
    np.testing.assert_allclose(complex(out[0]), complex(ref[0]),
                               rtol=0, atol=1e-6)          # y00
    np.testing.assert_allclose(complex(out[1]), complex(ref[1]),
                               rtol=0, atol=1e-6)          # y_pre
    assert complex(out[2]) == complex(ref[2])              # x_pre
    assert complex(out[3]) == complex(ref[3])              # xlast
    np.testing.assert_array_equal(np.asarray(out[4]), np.asarray(ref[4]))
