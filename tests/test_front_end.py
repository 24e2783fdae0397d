"""Fused DC-blocker + resampler kernel (kernels/front_end.py) correctness.

Interpret mode vs the pure-JAX op chain (ops/iir + ops/resample).  The fused
kernel re-orders the recurrence's f32 summations (matmul form vs sequential
scan), so equality is held to an SNR bound rather than bit-exactness —
>100 dB, far beyond the chain's acceptance bounds.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.kernels.front_end import (PallasFrontEnd, reference_impl,
                                              pick_tile, HIST)


def _snr_db(ref, err):
    p_ref = float(np.sum(np.abs(ref) ** 2))
    p_err = float(np.sum(np.abs(err) ** 2))
    return 10.0 * np.log10(p_ref / max(p_err, 1e-30))


def test_pick_tile():
    assert pick_tile(784, 512) == 392
    assert pick_tile(40 * 784, 448) == 448
    assert pick_tile(16, 512) == 16
    assert 448 * (20 * 784 // 448) == 20 * 784   # divides K=20 rows
    with pytest.raises(ValueError):
        pick_tile(12, 512)


def test_front_end_matches_opchain_streaming():
    """3 streamed blocks, multiple grid tiles, DC offset in the input."""
    rng = np.random.default_rng(0)
    fe = PallasFrontEnd(tile_rows=64, interpret=True)
    dcx, dcy, hist = fe.init_state()
    rdcx, rdcy, rhist = dcx, dcy, hist
    t = 128 * 112                       # 112 rows -> 2 tiles of 56
    for blk in range(3):
        x = jnp.asarray((rng.standard_normal(t)
                         + 1j * rng.standard_normal(t)
                         + (0.3 + 0.2j)).astype(np.complex64))
        dcx, dcy, hist, yr, yi = fe.apply_planes(
            dcx, dcy, hist, jnp.real(x), jnp.imag(x))
        band = jax.lax.complex(yr, yi).reshape(-1)
        rdcx, rdcy, rhist, rband = reference_impl(rdcx, rdcy, rhist, x)
        assert band.shape == rband.shape
        assert _snr_db(np.asarray(rband),
                       np.asarray(band - rband)) > 100.0, f"block {blk}"
        # carried state: DC scalars + y-space history track the op chain
        assert abs(complex(dcx) - complex(rdcx)) < 1e-5
        assert abs(complex(dcy) - complex(rdcy)) < 1e-5
        assert float(jnp.max(jnp.abs(hist - rhist))) < 1e-5


def test_front_end_complex_wrapper_and_geometry():
    rng = np.random.default_rng(1)
    fe = PallasFrontEnd(tile_rows=448, interpret=True)
    dcx, dcy, hist = fe.init_state()
    assert hist.shape == (HIST,)
    t = C.SUBCHUNK_IN                   # one real sub-chunk (784 rows)
    x = jnp.asarray((rng.standard_normal(t) + 1j * rng.standard_normal(t)
                     ).astype(np.complex64))
    dcx2, dcy2, hist2, band = fe.apply(dcx, dcy, hist, x)
    assert band.shape == (C.SUBCHUNK_RESAMP,)
    _, _, _, rband = reference_impl(dcx, dcy, hist, x)
    assert _snr_db(np.asarray(rband), np.asarray(band - rband)) > 100.0


def test_front_end_interleaved_matches_opchain_streaming():
    """apply_iq (bitcast interleaved input, in-kernel de-interleave) tracks
    the op chain across streamed blocks exactly like apply_planes."""
    rng = np.random.default_rng(2)
    fe = PallasFrontEnd(tile_rows=64, interpret=True)
    dcx, dcy, hist = fe.init_state()
    rdcx, rdcy, rhist = dcx, dcy, hist
    pdcx, pdcy, phist = dcx, dcy, hist
    t = 128 * 112
    for blk in range(3):
        x = jnp.asarray((rng.standard_normal(t)
                         + 1j * rng.standard_normal(t)
                         + (0.1 - 0.4j)).astype(np.complex64))
        dcx, dcy, hist, yr, yi = fe.apply_iq(dcx, dcy, hist, x)
        band = jax.lax.complex(yr, yi).reshape(-1)
        rdcx, rdcy, rhist, rband = reference_impl(rdcx, rdcy, rhist, x)
        assert _snr_db(np.asarray(rband),
                       np.asarray(band - rband)) > 100.0, f"block {blk}"
        assert abs(complex(dcx) - complex(rdcx)) < 1e-5
        assert abs(complex(dcy) - complex(rdcy)) < 1e-5
        assert float(jnp.max(jnp.abs(hist - rhist))) < 1e-5
        # and the two kernel layouts agree with each other just as tightly
        pdcx, pdcy, phist, pyr, pyi = fe.apply_planes(
            pdcx, pdcy, phist, jnp.real(x), jnp.imag(x))
        pband = jax.lax.complex(pyr, pyi).reshape(-1)
        assert _snr_db(np.asarray(pband),
                       np.asarray(band - pband)) > 110.0, f"block {blk}"


def test_front_end_packed_cs16_bitexact_vs_planes():
    """apply_packed (in-kernel SC16 decode) == decode_planes + apply_planes
    BIT-FOR-BIT across streamed blocks: the decode is exact integer->f32
    arithmetic, so the two paths share an arithmetic fixed point."""
    from sdr_pmr446_tpu.ops import decode as decode_op

    rng = np.random.default_rng(3)
    fe = PallasFrontEnd(tile_rows=64, interpret=True)
    dcx, dcy, hist = fe.init_state()
    pdcx, pdcy, phist = dcx, dcy, hist
    rdcx, rdcy, rhist = dcx, dcy, hist
    t = 128 * 112
    for blk in range(3):
        x = (0.5 * (rng.standard_normal(t) + 1j * rng.standard_normal(t))
             + (0.05 - 0.1j)).astype(np.complex64)
        w = jnp.asarray(decode_op.pack_iq(x, "cs16"))
        assert w.shape == (t,)
        dcx, dcy, hist, yr, yi = fe.apply_packed(dcx, dcy, hist, w)
        xr, xi = decode_op.decode_planes(w, "cs16")
        pdcx, pdcy, phist, pyr, pyi = fe.apply_planes(
            pdcx, pdcy, phist, xr, xi)
        np.testing.assert_array_equal(np.asarray(yr), np.asarray(pyr),
                                      err_msg=f"block {blk}")
        np.testing.assert_array_equal(np.asarray(yi), np.asarray(pyi),
                                      err_msg=f"block {blk}")
        np.testing.assert_array_equal(np.asarray(hist), np.asarray(phist))
        assert complex(dcx) == complex(pdcx)
        assert complex(dcy) == complex(pdcy)
        # and the op chain fed the decoded signal agrees to kernel SNR
        xq = jax.lax.complex(xr, xi)
        rdcx, rdcy, rhist, rband = reference_impl(rdcx, rdcy, rhist, xq)
        band = jax.lax.complex(yr, yi).reshape(-1)
        assert _snr_db(np.asarray(rband),
                       np.asarray(band - rband)) > 100.0, f"block {blk}"


@pytest.mark.parametrize("fmt", ["cu8", "cs8"])
def test_front_end_packed2_wide_matches_opchain(fmt):
    """apply_packed2 (wide-row in-kernel cu8/cs8 decode) tracks the op
    chain fed the decoded signal across streamed blocks, and its decode
    is bit-exact vs ops/decode.py (dc_x carry compares exactly)."""
    from sdr_pmr446_tpu.ops import decode as decode_op

    rng = np.random.default_rng(4)
    fe = PallasFrontEnd(tile_rows=64, interpret=True, wide=True)
    dcx, dcy, hist = fe.init_state()
    assert hist.shape == (fe.hist_len,) and fe.hist_len == 512
    rdcx, rdcy, rhist = dcx, dcy, hist
    t = 128 * 112
    for blk in range(3):
        x = (0.5 * (rng.standard_normal(t) + 1j * rng.standard_normal(t))
             + (0.05 - 0.1j)).astype(np.complex64)
        w = jnp.asarray(decode_op.pack_iq(x, fmt))
        assert w.shape == (t // 2,)
        dcx, dcy, hist, yr, yi = fe.apply_packed2(dcx, dcy, hist, w, fmt)
        assert yr.shape == (t // 128, 25)
        xr, xi = decode_op.decode_planes(w, fmt)
        xq = jax.lax.complex(xr, xi)
        rdcx, rdcy, rhist, rband = reference_impl(rdcx, rdcy, rhist, xq)
        band = jax.lax.complex(yr, yi).reshape(-1)
        assert _snr_db(np.asarray(rband),
                       np.asarray(band - rband)) > 100.0, f"block {blk}"
        # dc_x is the decoded wire value: bit-exact by construction
        assert complex(dcx) == complex(rdcx), f"block {blk}"
        assert abs(complex(dcy) - complex(rdcy)) < 1e-5
        assert float(jnp.max(jnp.abs(hist - rhist))) < 1e-5


def test_scanner_chain_fused_cu8_matches_decode_path():
    """Full scanner: fused wide-row cu8 decode == fuse_dc=False pallas
    chain fed the same wire words (decisions exactly, audio to fp)."""
    from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.ops import decode as decode_op

    iq = synth.make_scanner_iq(2 * C.SUBCHUNK_IN, channel=3, ctcss_code=7)
    w = decode_op.pack_iq(iq, "cu8")
    params = make_runtime_params(C.ScannerArgs())
    outs = {}
    for mode in ["fused", "unfused"]:
        chain = ScannerChain(C.BlockConfig(2), use_pallas=True,
                             pallas_interpret=True, input_format="cu8",
                             fuse_dc=(mode == "fused"))
        st = chain.init_state()
        _, o = chain.step(st, jnp.asarray(w), params)
        outs[mode] = o
    o1, o2 = outs["fused"], outs["unfused"]
    np.testing.assert_array_equal(np.asarray(o1.active_chan),
                                  np.asarray(o2.active_chan))
    np.testing.assert_array_equal(np.asarray(o1.ct_detected),
                                  np.asarray(o2.ct_detected))
    np.testing.assert_allclose(np.asarray(o1.rssi_db),
                               np.asarray(o2.rssi_db), rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(o1.audio),
                               np.asarray(o2.audio), rtol=0, atol=1e-3)


def test_scanner_chain_fused_cs16_matches_decode_path():
    """Full scanner: fused in-kernel cs16 decode == fuse_dc=False pallas
    chain fed the same wire words (decisions exactly, audio to fp)."""
    from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.ops import decode as decode_op

    iq = synth.make_scanner_iq(2 * C.SUBCHUNK_IN, channel=3, ctcss_code=7)
    w = decode_op.pack_iq(iq, "cs16")
    params = make_runtime_params(C.ScannerArgs())
    outs = {}
    for mode in ["fused", "unfused"]:
        chain = ScannerChain(C.BlockConfig(2), use_pallas=True,
                             pallas_interpret=True, input_format="cs16",
                             fuse_dc=(mode == "fused"))
        st = chain.init_state()
        _, o = chain.step(st, jnp.asarray(w), params)
        outs[mode] = o
    o1, o2 = outs["fused"], outs["unfused"]
    np.testing.assert_array_equal(np.asarray(o1.active_chan),
                                  np.asarray(o2.active_chan))
    np.testing.assert_array_equal(np.asarray(o1.ct_detected),
                                  np.asarray(o2.ct_detected))
    np.testing.assert_allclose(np.asarray(o1.rssi_db),
                               np.asarray(o2.rssi_db), rtol=0, atol=1e-2)
    np.testing.assert_allclose(np.asarray(o1.audio),
                               np.asarray(o2.audio), rtol=0, atol=1e-3)


def test_scanner_chain_fused_dc_matches_std():
    """Full scanner with fuse_dc=True == standard XLA chain (interpret)."""
    from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params
    from sdr_pmr446_tpu.io import synth

    iq = synth.make_scanner_iq(2 * 2 * C.SUBCHUNK_IN, channel=5,
                               ctcss_code=12)
    params = make_runtime_params(C.ScannerArgs())
    outs = {}
    for mode in ["std", "fused"]:
        chain = ScannerChain(C.BlockConfig(2), use_pallas=(mode == "fused"),
                             pallas_interpret=True, fuse_dc=True)
        assert chain.fuse_dc == (mode == "fused")
        st = chain.init_state()
        step = chain.block.input_len
        res = []
        for i in range(2):
            st, o = chain.step(st, jnp.asarray(
                iq[i * step:(i + 1) * step], jnp.complex64), params)
            res.append(o)
        outs[mode] = res
    for o1, o2 in zip(outs["std"], outs["fused"]):
        np.testing.assert_array_equal(np.asarray(o1.active_chan),
                                      np.asarray(o2.active_chan))
        np.testing.assert_array_equal(np.asarray(o1.ct_detected),
                                      np.asarray(o2.ct_detected))
        np.testing.assert_allclose(np.asarray(o1.rssi_db),
                                   np.asarray(o2.rssi_db), rtol=0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(o1.audio),
                                   np.asarray(o2.audio), rtol=0, atol=1e-3)


@pytest.mark.parametrize("fmt", ["cf32w", "cs16", "cu8"])
def test_scanner_chain_row_layout_input_bitexact(fmt):
    """step() fed the 2-D row layout (chain.step_arg_shape — what drivers
    feed to skip XLA's whole-block 1-D->tiled relayout pass) is BIT-exact
    vs the flat 1-D wire vector, outputs and state."""
    from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.ops import decode as decode_op

    iq = synth.make_scanner_iq(2 * C.SUBCHUNK_IN, channel=3, ctcss_code=7)
    if fmt == "cf32w":
        w = np.empty(2 * iq.shape[0], np.float32)
        w[0::2] = iq.real
        w[1::2] = iq.imag
    else:
        w = decode_op.pack_iq(iq, fmt)
    params = make_runtime_params(C.ScannerArgs())
    chain = ScannerChain(C.BlockConfig(2), use_pallas=True,
                         pallas_interpret=True, input_format=fmt)
    assert len(chain.step_arg_shape) == 2
    assert int(np.prod(chain.step_arg_shape)) == chain.step_arg_len
    st1, o1 = chain.step(chain.init_state(), jnp.asarray(w), params)
    st2, o2 = chain.step(chain.init_state(),
                         jnp.asarray(w.reshape(chain.step_arg_shape)),
                         params)
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
