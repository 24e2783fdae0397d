"""AOT export (apps/export_chain.py): serialized artifact == live chain."""

import numpy as np
import jax
import jax.numpy as jnp

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import synth


def test_exported_scanner_step_roundtrip(tmp_path):
    from sdr_pmr446_tpu.apps import export_chain
    from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params

    out = str(tmp_path / "scanner_k1.jaxexport")
    assert export_chain.main(["--config", "scanner", "-k", "1",
                              "--out", out]) == 0

    restored = jax.export.deserialize(open(out, "rb").read())
    assert "cpu" in restored.platforms

    chain = ScannerChain(C.BlockConfig(1))
    params = make_runtime_params(C.ScannerArgs())
    state = chain.init_state()
    iq = jnp.asarray(synth.make_scanner_iq(C.SUBCHUNK_IN, channel=5,
                                           ctcss_code=12), jnp.complex64)
    st_live, out_live = chain.step(state, iq, params)

    st_exp, out_exp = restored.call(chain.init_state(), iq, params)
    for a, b, name in zip(out_live, out_exp, out_live._fields):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
    del st_live, st_exp


def test_exported_dsd_step_roundtrip(tmp_path):
    from sdr_pmr446_tpu.apps import export_chain
    from sdr_pmr446_tpu.scanner.dsd_in import DsdInChain

    out = str(tmp_path / "dsd_k1.jaxexport")
    assert export_chain.main(["--config", "dsd", "-k", "1",
                              "--out", out]) == 0
    restored = jax.export.deserialize(open(out, "rb").read())

    chain = DsdInChain(subchunks_per_step=1)
    n = chain.input_len
    fs = C.SDR_SAMPLERATE
    t = np.arange(n) / fs
    msg = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    iq = jnp.asarray(np.exp(
        1j * 2 * np.pi * (2000.0 * np.cumsum(msg) + 300.0 * np.arange(n))
        / fs), jnp.complex64)
    _, o_live = chain.step(chain.init_state(), iq)
    _, o_exp = restored.call(chain.init_state(), iq)
    np.testing.assert_array_equal(np.asarray(o_live.pcm),
                                  np.asarray(o_exp.pcm))
