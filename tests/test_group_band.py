"""GROUP-major band path: front-end group emitters + PFB group kernel.

The group path moves the band between the front-end and PFB kernels as
[G, 400] group rows (bw[g, 25*rho+q] = band[2048g + 25rho + q]) — the
layout both kernels use natively — instead of round-tripping XLA's
band->frames relayout chain (~10 materialized buffers, ~8 B/input-sample
measured).  Math is identical to the row path up to f32 matmul rounding:
the band agrees to ~1e-6, every carried state exactly, and the full chain's
DECISIONS exactly (audio to fp; raw demod on noise-only channels is atan2
branch-flip sensitive at this rounding level BY NATURE — perturbing the row
path's own band by 2e-6 flips more entries than the group/row difference
does, so chain-level gates are the meaningful ones).
"""

import numpy as np

import jax.numpy as jnp
import pytest

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.kernels.front_end import PallasFrontEnd
from sdr_pmr446_tpu.kernels.pfb_demod import PallasPfbDemod
from sdr_pmr446_tpu.io import synth
from sdr_pmr446_tpu.ops import decode as decode_op


def _sig(n, seed=1):
    return synth.make_scanner_iq(n, channel=5, ctcss_code=12, seed=seed)


@pytest.mark.parametrize("fmt", ["planes", "cf32w", "cs16", "cu8"])
def test_front_group_band_matches_row_band(fmt):
    """bw_r/bw_i [G, 400] == the row path's [rows, 25] planes regrouped
    (flat band order is identical); carried state exactly equal."""
    n = 8 * C.SUBCHUNK_IN
    sig = _sig(n)
    wide = fmt == "cu8"
    fe = PallasFrontEnd(tile_rows=448, interpret=True, wide=wide)
    dcx, dcy, hist = fe.init_state()
    if fmt == "planes":
        args = (jnp.asarray(sig.real, jnp.float32),
                jnp.asarray(sig.imag, jnp.float32))
        run = lambda g: fe.apply_planes(dcx, dcy, hist, *args, group_out=g)
    elif fmt == "cf32w":
        w = np.empty(2 * n, np.float32)
        w[0::2] = sig.real
        w[1::2] = sig.imag
        run = lambda g: fe.apply_interleaved(dcx, dcy, hist,
                                             jnp.asarray(w), group_out=g)
    elif fmt == "cs16":
        w = decode_op.pack_iq(sig, "cs16")
        run = lambda g: fe.apply_packed(dcx, dcy, hist, jnp.asarray(w),
                                        group_out=g)
    else:
        w = decode_op.pack_iq(sig, "cu8")
        run = lambda g: fe.apply_packed2(dcx, dcy, hist, jnp.asarray(w),
                                         "cu8", group_out=g)
    d1, y1, h1, yr, yi = run(False)
    d2, y2, h2, bwr, bwi = run(True)
    g_total = n // 2048
    assert bwr.shape == (g_total, 400)
    np.testing.assert_allclose(np.asarray(bwr),
                               np.asarray(yr).reshape(g_total, 400),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bwi),
                               np.asarray(yi).reshape(g_total, 400),
                               rtol=0, atol=1e-5)
    assert complex(d1) == complex(d2)        # decoded input value: exact
    # dc_y / hist: same math, different program-level fusion -> ~1 ulp
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                               rtol=0, atol=1e-5)


def test_pfb_group_matches_rssi_path():
    """call_group == call_planes_rssi on the same band: mag sums to f32
    summation rounding, every carry (hist/parity/prev) tight, for both
    input parities; multiple grid tiles exercise the scratch carries."""
    n = 8 * C.SUBCHUNK_IN
    sig = _sig(n)
    fe = PallasFrontEnd(tile_rows=448, interpret=True)
    dcx, dcy, hist0 = fe.init_state()
    _, _, _, bwr, bwi = fe.apply_planes(
        dcx, dcy, hist0, jnp.asarray(sig.real, jnp.float32),
        jnp.asarray(sig.imag, jnp.float32), group_out=True)
    _, _, _, yr, yi = fe.apply_planes(
        dcx, dcy, hist0, jnp.asarray(sig.real, jnp.float32),
        jnp.asarray(sig.imag, jnp.float32))
    pfb = PallasPfbDemod(tile_f=1024, interpret=True)
    ph = jnp.zeros((400,), jnp.complex64)
    rng = np.random.default_rng(5)
    prev = jnp.asarray(rng.standard_normal(16) + 1j * rng.standard_normal(16),
                       jnp.complex64)
    for par_v in (0, 1):
        par = jnp.asarray(par_v, jnp.int32)
        d1, m1, h1, p1, pr1 = pfb.call_planes_rssi(
            yr.reshape(-1), yi.reshape(-1), ph, par, prev)
        d3, m3, h3, p3, pr3 = pfb.call_group(bwr, bwi, ph, par, prev)
        assert d3.shape == (16, n // 2048, 25)
        np.testing.assert_allclose(np.asarray(m3), np.asarray(m1),
                                   rtol=2e-4, atol=0)
        assert float(jnp.max(jnp.abs(h1 - h3))) < 1e-5
        assert int(p1) == int(p3)
        assert float(jnp.max(jnp.abs(pr1 - pr3))) < 1e-5


@pytest.mark.parametrize("fmt", ["cf32w", "cs16", "cu8"])
def test_chain_group_engine_matches_row_engine(fmt):
    """Full scanner, two chained blocks: fuse_group decisions == row-path
    decisions exactly, RSSI within 0.01 dB, audio to fp."""
    from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params

    K = 8
    params = make_runtime_params(C.ScannerArgs())
    n = C.BlockConfig(K).input_len
    blocks = []
    for seed in (0, 7):
        sig = _sig(n, seed)
        if fmt == "cf32w":
            w = np.empty(2 * n, np.float32)
            w[0::2] = sig.real
            w[1::2] = sig.imag
        else:
            w = decode_op.pack_iq(sig, fmt)
        blocks.append(w)
    outs = {}
    for mode in (True, False):
        chain = ScannerChain(C.BlockConfig(K), use_pallas=True,
                             input_format=fmt, pallas_interpret=True,
                             fuse_group=mode)
        assert chain.fuse_group == mode
        st = chain.init_state()
        res = []
        for w in blocks:
            st, o = chain.step(
                st, jnp.asarray(w.reshape(chain.step_arg_shape)), params)
            res.append(o)
        outs[mode] = res
    for blk, (a, b) in enumerate(zip(outs[True], outs[False])):
        np.testing.assert_array_equal(np.asarray(a.active_chan),
                                      np.asarray(b.active_chan))
        np.testing.assert_array_equal(np.asarray(a.ct_detected),
                                      np.asarray(b.ct_detected))
        np.testing.assert_array_equal(np.asarray(a.ct_max_idx),
                                      np.asarray(b.ct_max_idx))
        np.testing.assert_allclose(np.asarray(a.rssi_db),
                                   np.asarray(b.rssi_db), rtol=0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(a.audio),
                                   np.asarray(b.audio), rtol=0, atol=1e-3)


def test_pfb_group_packed_matches_unpacked():
    """The phase-PACKED group body (7 full-lane MXU dots, see
    kernels/pfb_demod.py::_packed_consts) == the per-phase body: mag
    sums and carries to f32 summation-reorder rounding (the packed dot
    contracts [wr | wi] in ONE 928-deep accumulation), demod tight on
    the ACTIVE channel (noise channels are atan2 branch-flip sensitive
    by nature, see module docstring)."""
    n = 8 * C.SUBCHUNK_IN
    sig = _sig(n)
    fe = PallasFrontEnd(tile_rows=448, interpret=True)
    dcx, dcy, hist0 = fe.init_state()
    _, _, _, bwr, bwi = fe.apply_planes(
        dcx, dcy, hist0, jnp.asarray(sig.real, jnp.float32),
        jnp.asarray(sig.imag, jnp.float32), group_out=True)
    pfb = PallasPfbDemod(tile_f=1024, interpret=True)
    ph = jnp.zeros((400,), jnp.complex64)
    rng = np.random.default_rng(5)
    prev = jnp.asarray(rng.standard_normal(16) + 1j * rng.standard_normal(16),
                       jnp.complex64)
    for par_v in (0, 1):
        par = jnp.asarray(par_v, jnp.int32)
        d0, m0, h0, p0, pr0 = pfb.call_group(bwr, bwi, ph, par, prev,
                                             packed=False)
        d1, m1, h1, p1, pr1 = pfb.call_group(bwr, bwi, ph, par, prev,
                                             packed=True)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                                   rtol=2e-4, atol=0)
        assert float(jnp.max(jnp.abs(h1 - h0))) == 0.0
        assert int(p1) == int(p0)
        assert float(jnp.max(jnp.abs(pr1 - pr0))) < 1e-5
        np.testing.assert_allclose(np.asarray(d1)[5], np.asarray(d0)[5],
                                   rtol=0, atol=5e-3)


def test_chain_packed_pfb_matches_unpacked():
    """Full scanner, two chained blocks: pfb_packed decisions == per-phase
    decisions exactly, RSSI within 0.01 dB, audio to fp."""
    from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params

    K = 8
    params = make_runtime_params(C.ScannerArgs())
    n = C.BlockConfig(K).input_len
    blocks = []
    for seed in (0, 7):
        sig = _sig(n, seed)
        w = np.empty(2 * n, np.float32)
        w[0::2] = sig.real
        w[1::2] = sig.imag
        blocks.append(w)
    outs = {}
    for mode in (True, False):
        chain = ScannerChain(C.BlockConfig(K), use_pallas=True,
                             input_format="cf32w", pallas_interpret=True,
                             pfb_packed=mode)
        assert chain.fuse_group and chain.pfb_packed == mode
        st = chain.init_state()
        res = []
        for w in blocks:
            st, o = chain.step(
                st, jnp.asarray(w.reshape(chain.step_arg_shape)), params)
            res.append(o)
        outs[mode] = res
    for a, b in zip(outs[True], outs[False]):
        np.testing.assert_array_equal(np.asarray(a.active_chan),
                                      np.asarray(b.active_chan))
        np.testing.assert_array_equal(np.asarray(a.ct_detected),
                                      np.asarray(b.ct_detected))
        np.testing.assert_array_equal(np.asarray(a.ct_max_idx),
                                      np.asarray(b.ct_max_idx))
        np.testing.assert_allclose(np.asarray(a.rssi_db),
                                   np.asarray(b.rssi_db), rtol=0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(a.audio),
                                   np.asarray(b.audio), rtol=0, atol=1e-4)


def test_group_engine_gate():
    """fuse_group engages only on the all-fused path with K % 8 == 0."""
    from sdr_pmr446_tpu.scanner.chain import ScannerChain
    c = ScannerChain(C.BlockConfig(8), use_pallas=True, input_format="cf32w",
                     pallas_interpret=True)
    assert c.fuse_group
    c = ScannerChain(C.BlockConfig(2), use_pallas=True, input_format="cf32w",
                     pallas_interpret=True)
    assert not c.fuse_group                  # K % 8 != 0 -> row path
    c = ScannerChain(C.BlockConfig(8), use_pallas=True, input_format="cf32w",
                     pallas_interpret=True, fuse_rssi=False)
    assert not c.fuse_group                  # needs the all-fused path
