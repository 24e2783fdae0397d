"""Sharded-vs-unsharded equivalence on a virtual 8-device CPU mesh.

The halo-exchange overlap-save correctness gate of SURVEY.md §7: the
time-sharded scanner must reproduce the single-device chain's outputs
(control decisions exactly; audio within fp tolerance).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import synth
from sdr_pmr446_tpu.parallel.scanner_sharded import (ShardedScannerChain,
                                                     make_mesh)
from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params


def _run_single(iq, subchunks_per_step, n_steps):
    chain = ScannerChain(C.BlockConfig(subchunks_per_step))
    params = make_runtime_params(C.ScannerArgs())
    st = chain.init_state()
    outs = []
    step = chain.block.input_len
    for i in range(n_steps):
        st, o = chain.step(st, jnp.asarray(iq[i * step:(i + 1) * step],
                                           jnp.complex64), params)
        outs.append(jax.tree.map(np.asarray, o))
    return outs


@pytest.mark.parametrize("mesh_shape", [(1, 4), (2, 4), (1, 8)])
def test_sharded_equals_unsharded(mesh_shape):
    n_stream, n_time = mesh_shape
    if n_stream * n_time > len(jax.devices()):
        pytest.skip("not enough devices")
    subchunks = 8
    n_steps = 2
    step_len = subchunks * C.SUBCHUNK_IN

    iqs = [synth.make_scanner_iq(n_steps * step_len, channel=3 + s,
                                 ctcss_code=5 + s, seed=s)
           for s in range(n_stream)]

    # single-device reference, per stream
    singles = [_run_single(iq, subchunks, n_steps) for iq in iqs]

    mesh = make_mesh(n_stream, n_time)
    chain = ShardedScannerChain(mesh, C.BlockConfig(subchunks))
    params = make_runtime_params(C.ScannerArgs())
    st = chain.init_state(n_stream)
    for i in range(n_steps):
        blk = np.stack([iq[i * step_len:(i + 1) * step_len] for iq in iqs])
        st, out = chain.step(st, jnp.asarray(blk, jnp.complex64), params)
        out = jax.tree.map(np.asarray, out)
        for s in range(n_stream):
            ref = singles[s][i]
            np.testing.assert_array_equal(out.active_chan[s],
                                          ref.active_chan)
            np.testing.assert_array_equal(out.audio_valid[s],
                                          ref.audio_valid)
            np.testing.assert_array_equal(out.ct_detected[s],
                                          ref.ct_detected)
            np.testing.assert_array_equal(out.ct_max_idx[s], ref.ct_max_idx)
            np.testing.assert_allclose(out.rssi_db[s], ref.rssi_db,
                                       rtol=0, atol=5e-4)
            np.testing.assert_allclose(out.rel_rssi[s], ref.rel_rssi,
                                       rtol=0, atol=5e-4)
            np.testing.assert_allclose(out.audio[s], ref.audio,
                                       rtol=0, atol=1e-4)


def test_sharded_state_carries_across_steps():
    # tune happens in step 1; step 2 must continue tuned with CTCSS held
    n_time = 4
    subchunks = 4
    step_len = subchunks * C.SUBCHUNK_IN
    iq = synth.make_scanner_iq(3 * step_len, channel=7, ctcss_code=20)
    mesh = make_mesh(1, n_time)
    chain = ShardedScannerChain(mesh, C.BlockConfig(subchunks))
    params = make_runtime_params(C.ScannerArgs())
    st = chain.init_state(1)
    det = []
    for i in range(3):
        st, out = chain.step(
            st, jnp.asarray(iq[None, i * step_len:(i + 1) * step_len],
                            jnp.complex64), params)
        det.append(np.asarray(out.ct_detected)[0])
    assert int(np.asarray(st.active_chan)[0]) == 6
    assert bool(np.asarray(st.ct_detected)[0])
    assert int(np.asarray(st.ct_max_idx)[0]) == 19
