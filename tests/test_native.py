"""Native IO engine tests (run against libsdrio.so when built, and against
the NumPy fallbacks otherwise — both paths are exercised via monkeypatch)."""


import numpy as np
import pytest

from sdr_pmr446_tpu.io import native


@pytest.fixture(params=["native", "fallback"])
def io_mode(request, monkeypatch):
    if request.param == "native":
        if not native.have_native():
            if not native.build_native():
                pytest.skip("native build unavailable")
    else:
        monkeypatch.setattr(native, "_lib", None)
    return request.param


def test_ring_buffer_basic(io_mode):
    r = native.RingBuffer(16)
    assert r.size() == 0
    assert r.write(np.arange(10, dtype=np.float32)) == 10
    assert r.size() == 10
    out = r.read(6)
    np.testing.assert_array_equal(out, np.arange(6, dtype=np.float32))
    # wraparound
    assert r.write(np.arange(10, 20, dtype=np.float32)) == 10
    out = r.read(14)
    np.testing.assert_array_equal(out, np.arange(6, 20, dtype=np.float32))


def test_ring_buffer_overflow_underflow(io_mode):
    r = native.RingBuffer(8)
    assert r.write(np.ones(12, np.float32)) == 8   # truncates at capacity
    out = r.read(10, zero_fill=True)               # underrun zero-fills
    np.testing.assert_array_equal(out[:8], np.ones(8, np.float32))
    np.testing.assert_array_equal(out[8:], np.zeros(2, np.float32))


@pytest.mark.parametrize("fmt,dtype", [("cs16", np.int16), ("cu8", np.uint8),
                                       ("cs8", np.int8)])
def test_convert_iq(io_mode, fmt, dtype):
    rng = np.random.default_rng(0)
    if fmt == "cu8":
        raw = rng.integers(0, 256, 2048, dtype=dtype)
    else:
        info = np.iinfo(dtype)
        raw = rng.integers(info.min, info.max, 2048, dtype=dtype)
    x = native.convert_iq(raw, fmt)
    assert x.dtype == np.complex64 and len(x) == 1024
    scale = {"cs16": 32768.0, "cu8": None, "cs8": 128.0}[fmt]
    f = raw.astype(np.float64)
    ref = ((f - 127.5) / 127.5 if scale is None else f / scale)
    np.testing.assert_allclose(x.real, ref[0::2], atol=1e-6)
    np.testing.assert_allclose(x.imag, ref[1::2], atol=1e-6)


def test_capture_reader_blocks(io_mode, tmp_path):
    from sdr_pmr446_tpu.io import iq as iq_io
    # 0.2 scale keeps all samples inside the cs16 range (no clipping)
    iq = (np.random.default_rng(1).standard_normal(2500)
          + 1j * np.random.default_rng(2).standard_normal(2500)
          ).astype(np.complex64) * 0.2
    p = str(tmp_path / "cap.cs16")
    iq_io.write_iq(p, iq, "cs16")
    rd = native.CaptureReader(p, "cs16")
    b1, n1 = rd.read_block(1000)
    b2, n2 = rd.read_block(1000)
    b3, n3 = rd.read_block(1000)
    rd.close()
    assert (n1, n2, n3) == (1000, 1000, 500)
    got = np.concatenate([b1, b2, b3[:500]])
    np.testing.assert_allclose(got, iq, atol=2e-4)
    np.testing.assert_array_equal(b3[500:], 0)


def test_wav_writer_streaming(io_mode, tmp_path):
    from sdr_pmr446_tpu.io import wav as wav_io
    x = np.sin(np.linspace(0, 30, 5000)).astype(np.float32) * 0.8
    for s16 in (False, True):
        p = str(tmp_path / f"out_{s16}.wav")
        w = native.WavWriter(p, 12500, s16=s16)
        w.write(x[:2000])
        w.write(x[2000:])
        w.close()
        y, rate = wav_io.read_wav(p)
        assert rate == 12500
        np.testing.assert_allclose(y, x, atol=1e-4 if s16 else 1e-7)


def test_streaming_source_threads(io_mode, tmp_path):
    from sdr_pmr446_tpu.io import iq as iq_io
    from sdr_pmr446_tpu.runtime.stream import StreamingSource
    n = 25000
    iq = (0.1 * (np.random.default_rng(5).standard_normal(n)
                 + 1j * np.random.default_rng(6).standard_normal(n))
          ).astype(np.complex64)
    p = str(tmp_path / "cap.cf32")
    iq_io.write_iq(p, iq)
    src = StreamingSource(p, block_len=8192, read_chunk=1000)
    blocks = list(src.blocks())
    src.close()
    got = np.concatenate(blocks)
    assert len(got) % 8192 == 0 and len(got) >= n
    np.testing.assert_allclose(got[:n], iq, atol=1e-6)
    np.testing.assert_array_equal(got[n:], 0)


def test_streaming_source_drives_scanner(io_mode, tmp_path):
    from sdr_pmr446_tpu.io import iq as iq_io, synth
    from sdr_pmr446_tpu.runtime.stream import StreamingSource
    from sdr_pmr446_tpu.runtime.driver import ScannerDriver
    from sdr_pmr446_tpu import config as C
    iq = synth.make_scanner_iq(10 * C.SUBCHUNK_IN, channel=5, ctcss_code=12)
    p = str(tmp_path / "cap.cs16")
    iq_io.write_iq(p, 0.5 * iq, "cs16")
    drv = ScannerDriver(subchunks_per_step=5)
    src = StreamingSource(p, block_len=drv.block_len, fmt="cs16")
    res = drv.run(src.blocks())
    src.close()
    assert any(e.startswith("Tuned to channel 5") for e in res.events)


def test_batch_reader(io_mode, tmp_path):
    from sdr_pmr446_tpu.io import iq as iq_io
    rng = np.random.default_rng(11)
    paths, data = [], []
    for s in range(3):
        x = (0.2 * (rng.standard_normal(5000) + 1j * rng.standard_normal(5000))
             ).astype(np.complex64)
        p = str(tmp_path / f"s{s}.cs16")
        iq_io.write_iq(p, x, "cs16")
        paths.append(p)
        data.append(x)
    br = native.BatchReader(paths, ["cs16"] * 3)
    b1, g1 = br.read_block(3000)
    b2, g2 = br.read_block(3000)
    b3, g3 = br.read_block(3000)
    br.close()
    assert (g1, g2, g3) == (3000, 2000, 0)
    for s in range(3):
        got = np.concatenate([b1[s], b2[s][:2000]])
        np.testing.assert_allclose(got, data[s], atol=2e-4)
        np.testing.assert_array_equal(b2[s][2000:], 0)


def test_streaming_source_emits_all_tail_blocks():
    """A reader that delivers several blocks' worth in one chunk before
    EOF must yield EVERY block (the eof branch drains full blocks before
    the zero-padded tail — data between the consumer's size check and the
    eof flag was previously droppable)."""
    import numpy as np
    from sdr_pmr446_tpu.runtime.stream import StreamingSource

    data = (np.arange(3500, dtype=np.float32)
            + 1j * (1.0 + np.arange(3500, dtype=np.float32))).astype(
        np.complex64)

    class ChunkyReader:
        def __init__(self):
            self.sent = False

        def read_block(self, n):
            if self.sent:
                return np.zeros(n, np.complex64), 0
            self.sent = True
            out = np.zeros(n, np.complex64)
            out[:len(data)] = data
            return out, len(data)

        def close(self):
            pass

    src = StreamingSource.__new__(StreamingSource)
    StreamingSource._init_with_reader(src, ChunkyReader(), 1000,
                                      read_chunk=4096)
    blocks = list(src.blocks())
    src.close()
    assert len(blocks) == 4                    # 3 full + zero-padded tail
    got = np.concatenate(blocks)
    np.testing.assert_array_equal(got[:3500], data)
    np.testing.assert_array_equal(got[3500:], np.zeros(500, np.complex64))
