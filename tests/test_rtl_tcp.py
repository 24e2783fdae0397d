"""rtl_tcp network IQ source: loopback-server differential tests."""

import socket
import struct
import threading

import numpy as np
import pytest

from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import native
from sdr_pmr446_tpu.io.rtl_tcp import (RtlTcpClient, RtlTcpSource,
                                       parse_url, MAGIC,
                                       CMD_SET_FREQ, CMD_SET_SAMPLE_RATE,
                                       CMD_SET_GAIN_MODE, CMD_SET_GAIN)


class FakeRtlTcpServer:
    """Minimal rtl_tcp loopback: header + deterministic cu8 stream, records
    the 5-byte commands the client sends."""

    def __init__(self, n_samples: int, tuner_type: int = 5,
                 gain_count: int = 29, payload: bytes | None = None):
        self.n_samples = n_samples
        self.tuner_type = tuner_type
        self.gain_count = gain_count
        self.commands = []
        if payload is None:
            rng = np.random.default_rng(42)
            payload = rng.integers(0, 256, 2 * n_samples,
                                   dtype=np.uint8).tobytes()
        self.payload = payload
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        conn.settimeout(5.0)
        conn.sendall(MAGIC + struct.pack(">II", self.tuner_type,
                                         self.gain_count))
        # read the setup commands (rate, freq, gain mode, gain)
        try:
            buf = b""
            while len(buf) < 4 * 5:
                chunk = conn.recv(4 * 5 - len(buf))
                if not chunk:
                    break
                buf += chunk
            for i in range(0, len(buf) - 4, 5):
                op, arg = struct.unpack(">BI", buf[i:i + 5])
                self.commands.append((op, arg))
            conn.sendall(self.payload)
            conn.shutdown(socket.SHUT_WR)
            # drain anything else until the client hangs up
            while conn.recv(4096):
                pass
        except OSError:
            pass
        finally:
            conn.close()
            self.sock.close()


def test_rtl_tcp_url_parse():
    assert parse_url("rtl_tcp://radio.lan:2345") == ("radio.lan", 2345)
    assert parse_url("rtl_tcp://10.0.0.7") == ("10.0.0.7", 1234)


def test_rtl_tcp_client_reads_and_configures():
    n = 5000
    srv = FakeRtlTcpServer(n)
    cli = RtlTcpClient("127.0.0.1", srv.port, sample_rate=1_024_000,
                       frequency=446_100_000, gain_db=42.0)
    assert cli.tuner_name == "R820T"
    assert cli.gain_count == 29
    x1, got1 = cli.read_block(3000)
    x2, got2 = cli.read_block(3000)           # short: only 2000 remain
    cli.close()
    srv.thread.join(timeout=5)
    assert got1 == 3000 and got2 == 2000
    # exact cu8 conversion parity with the file path
    raw = np.frombuffer(srv.payload, np.uint8)
    expect = native.convert_iq(raw, "cu8")
    np.testing.assert_array_equal(x1, expect[:3000])
    np.testing.assert_array_equal(x2[:2000], expect[3000:5000])
    np.testing.assert_array_equal(x2[2000:], 0)
    # tuning commands in init_soapy order: rate, freq, gain mode, gain
    assert srv.commands[0] == (CMD_SET_SAMPLE_RATE, 1_024_000)
    assert srv.commands[1] == (CMD_SET_FREQ, 446_100_000)
    assert srv.commands[2] == (CMD_SET_GAIN_MODE, 1)
    assert srv.commands[3] == (CMD_SET_GAIN, 420)


def test_rtl_tcp_source_blocks():
    """Threaded ring-buffered source yields exact fixed-size blocks."""
    n = 4 * 2048
    srv = FakeRtlTcpServer(n)
    src = RtlTcpSource(f"rtl_tcp://127.0.0.1:{srv.port}", block_len=2048,
                       max_samples=3 * 2048)
    blocks = list(src.blocks())
    src.close()
    raw = np.frombuffer(srv.payload, np.uint8)
    expect = native.convert_iq(raw, "cu8")
    assert len(blocks) == 3                   # max_samples caps the stream
    got = np.concatenate(blocks)
    np.testing.assert_array_equal(got, expect[:3 * 2048])


def test_rtl_tcp_rejects_bad_magic():
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    sock.listen(1)
    port = sock.getsockname()[1]

    def serve():
        conn, _ = sock.accept()
        conn.sendall(b"HTTP" + b"\x00" * 8)
        conn.close()
        sock.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    with pytest.raises(RuntimeError, match="not an rtl_tcp server"):
        RtlTcpClient("127.0.0.1", port)
    t.join(timeout=5)


def test_scanner_app_rtl_tcp_end_to_end(tmp_path):
    """Full CLI drive: --input rtl_tcp://... streams a synthetic NBFM
    capture through the loopback server; the scanner must tune and write
    the demodulated audio."""
    from sdr_pmr446_tpu.io import synth
    from sdr_pmr446_tpu.apps import sdr_pmr446 as app
    from sdr_pmr446_tpu.io import wav

    n = 5 * C.SUBCHUNK_IN
    iq = 0.6 * synth.make_scanner_iq(n, channel=5, ctcss_code=12)
    # encode as cu8 the way rtl_sdr would
    inter = np.empty(2 * n, np.float32)
    inter[0::2] = iq.real
    inter[1::2] = iq.imag
    cu8 = np.clip(np.round(inter * 127.5 + 127.5), 0, 255).astype(np.uint8)

    srv = FakeRtlTcpServer(n, payload=cu8.tobytes())

    outp = str(tmp_path / "live.wav")
    rc = app.main(["--input", f"rtl_tcp://127.0.0.1:{srv.port}",
                   "--output", outp, "--subchunks-per-step", "5",
                   "--seconds", str(n / C.SDR_SAMPLERATE)])
    assert rc == 0
    audio, rate = wav.read_wav(outp)
    assert rate == C.AUDIO_SAMPLERATE
    assert len(audio) > 0
    snr = synth.tone_snr_db(audio[2 * 1225:], 1000.0)
    assert snr > 25.0


def test_rtl_tcp_client_rides_out_transient_stalls():
    """A stall longer than the socket timeout must NOT end the stream
    (reference behavior: read errors log & continue, src/sdr_pmr446.c:
    791-794); only a closed connection ends it."""
    import time
    n = 2000
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 256, 2 * n, dtype=np.uint8).tobytes()
    half = len(payload) // 2

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]

    def serve():
        conn, _ = srv.accept()
        conn.sendall(MAGIC + struct.pack(">II", 5, 29))
        conn.recv(4 * 5)                      # setup commands
        conn.sendall(payload[:half])
        time.sleep(0.7)                       # > client timeout: stall
        conn.sendall(payload[half:])
        conn.shutdown(socket.SHUT_WR)
        try:
            while conn.recv(4096):
                pass
        except OSError:
            pass
        conn.close()
        srv.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    cli = RtlTcpClient("127.0.0.1", port, timeout=0.2)
    x, got = cli.read_block(n)
    assert got == n                           # stall bridged, not EOF
    want = native.convert_iq(np.frombuffer(payload, np.uint8), "cu8")
    np.testing.assert_array_equal(x, want)
    # a CLOSED connection still ends the stream
    x2, got2 = cli.read_block(100)
    assert got2 == 0
    cli.close()
    t.join(timeout=5)


def test_dsd_in_app_live_rtl_tcp(tmp_path):
    """dsd_in over a live rtl_tcp stream: tunes to -f, streams one block,
    emits 48 kHz s16 (the reference dsd_in's live role, src/dsd_in.c:151)."""
    from sdr_pmr446_tpu.apps import dsd_in as app
    n = C.SUBCHUNK_IN
    srv = FakeRtlTcpServer(n)
    outp = str(tmp_path / "pcm.s16")
    rc = app.main(["--input", f"rtl_tcp://127.0.0.1:{srv.port}",
                   "--output", outp, "--subchunks-per-step", "1",
                   "--seconds", "0.098", "-f", "160000000"])
    assert rc == 0
    pcm = np.fromfile(outp, np.int16)
    assert len(pcm) == n * 3 // 64
    assert (CMD_SET_FREQ, 160_000_000) in srv.commands
    # --device-decode is file-only
    assert app.main(["--input", "rtl_tcp://127.0.0.1:1",
                     "--device-decode", "--output", outp]) == 1
