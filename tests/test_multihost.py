"""Real 2-process DCN execution test (localhost coordinator, CPU devices).

Spawns two worker processes, each owning 2 virtual CPU devices; the
(1 stream x 4 time) scanner mesh therefore spans the process boundary, so
every halo exchange / all-gather in the sharded chain crosses DCN.  Each
worker independently verifies its addressable output shards against the
single-device unsharded chain — the multi-host half of the sharded ==
unsharded guarantee (SURVEY §2c / BASELINE "N>=2 hosts").
"""

import json
import os
import socket
import subprocess
import sys


_WORKER = r"""
import json, os, sys
import numpy as np

addr = sys.argv[1]
pid = int(sys.argv[2])
out_path = sys.argv[3]

import jax
from sdr_pmr446_tpu.parallel import distributed as dist

dist.initialize(addr, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from sdr_pmr446_tpu import config as C
from sdr_pmr446_tpu.io import synth
from sdr_pmr446_tpu.parallel.scanner_sharded import (ShardedScannerChain,
                                                     STREAM_AXIS, TIME_AXIS)
from sdr_pmr446_tpu.scanner.chain import ScannerChain, make_runtime_params

mesh = dist.global_mesh(1, 4, axis_names=(STREAM_AXIS, TIME_AXIS))
K = 4
chain = ShardedScannerChain(mesh, C.BlockConfig(subchunks_per_step=K))
params = make_runtime_params(C.ScannerArgs())

# identical deterministic input in both processes
n = chain.block.input_len
iq = synth.make_scanner_iq(n, channel=5, ctcss_code=12).astype(np.complex64)

state_specs = jax.tree.map(lambda _: P(STREAM_AXIS), chain._state_struct())
state_host = jax.tree.map(lambda a: np.asarray(a)[None], chain._state_struct())
gstate = dist.globalize_pytree(mesh, state_specs, state_host)
giq = dist.make_global_array(mesh, P(STREAM_AXIS, TIME_AXIS), iq[None])
gparams = jax.tree.map(lambda a: np.asarray(a), params)

new_state, out = chain.step(gstate, giq, type(params)(*gparams))
jax.block_until_ready(out)

# single-device reference on the local default device
ref_chain = ScannerChain(C.BlockConfig(subchunks_per_step=K))
rstate, rout = ref_chain.step(ref_chain.init_state(),
                              jnp.asarray(iq), params)

report = {"process": pid, "checked": 0, "errors": []}
for name, g, r in zip(out._fields, out, rout):
    r_np = np.asarray(r)[None]                    # add the stream axis
    for shard in g.addressable_shards:
        got = np.asarray(shard.data)
        want = r_np[shard.index]
        if got.dtype.kind in "fc":
            ok = np.allclose(got, want, rtol=0, atol=2e-3)
        else:
            ok = np.array_equal(got, want)
        report["checked"] += 1
        if not ok:
            report["errors"].append(name)
with open(out_path, "w") as f:
    json.dump(report, f)
"""



def test_two_process_dcn_sharded_equals_unsharded(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    })
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = []
    outs = []
    for pid in range(2):
        outp = str(tmp_path / f"report{pid}.json")
        outs.append(outp)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), addr, str(pid), outp],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    logs = [p.communicate(timeout=540) for p in procs]
    for pid, (p, (so, se)) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, (
            f"worker {pid} failed:\n{se.decode()[-3000:]}")
    for pid, outp in enumerate(outs):
        rep = json.load(open(outp))
        assert rep["checked"] > 0
        assert rep["errors"] == [], rep


_SB_WORKER = r"""
import json, os, sys
addr, pid, outdir = sys.argv[1], sys.argv[2], sys.argv[3]
caps = sys.argv[4:]
extra = json.loads(os.environ.get("SB_EXTRA", "[]"))
from sdr_pmr446_tpu.apps import scan_batch
rc = scan_batch.main(caps + [
    "--out-dir", outdir, "--mesh", "2,2", "--subchunks-per-step", "4",
    "--coordinator", addr, "--num-processes", "2", "--process-id", pid]
    + extra)
sys.exit(rc)
"""


def test_scan_batch_two_process(tmp_path):
    """The scan_batch CLI on a REAL 2-process (2x2 global mesh) run:
    process 0's outputs equal a single-process run of the same captures."""
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.io import iq as iq_io, synth, wav
    from sdr_pmr446_tpu.apps import scan_batch

    caps = []
    for s, (ch, code) in enumerate([(5, 12), (9, 20)]):
        iq = 0.8 * synth.make_scanner_iq(4 * C.SUBCHUNK_IN, channel=ch,
                                         ctcss_code=code, seed=s)
        pth = str(tmp_path / f"mcap{s}.cs16")
        iq_io.write_iq(pth, iq, "cs16")
        caps.append(pth)

    ref_dir = str(tmp_path / "ref")
    assert scan_batch.main(caps + ["--out-dir", ref_dir, "--mesh", "2,2",
                                   "--subchunks-per-step", "4"]) == 0

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    worker_py = tmp_path / "sb_worker.py"
    worker_py.write_text(_SB_WORKER)
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    })
    env.pop("JAX_NUM_CPU_DEVICES", None)
    outdirs = [str(tmp_path / f"mh{pid}") for pid in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, str(worker_py), addr, str(pid), outdirs[pid]]
        + caps, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    logs = [p.communicate(timeout=540) for p in procs]
    for pid, (p, (so, se)) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, (
            f"worker {pid} failed:\n{se.decode()[-3000:]}")

    for s in range(2):
        a_ref, _ = wav.read_wav(os.path.join(ref_dir, f"mcap{s}.wav"))
        a_mh, _ = wav.read_wav(os.path.join(outdirs[0], f"mcap{s}.wav"))
        assert len(a_mh) == len(a_ref)
        np.testing.assert_allclose(a_mh, a_ref, rtol=0, atol=2e-3)
        ev_ref = open(os.path.join(ref_dir, f"mcap{s}.events.log")).read()
        ev_mh = open(os.path.join(outdirs[0],
                                  f"mcap{s}.events.log")).read()
        assert ev_mh == ev_ref
    # non-writer process produced no files
    assert not os.path.exists(os.path.join(outdirs[1], "mcap0.wav"))


def test_scan_batch_two_process_checkpoint_resume(tmp_path):
    """Kill-and-resume on the 2-process DCN path (VERDICT r4 #3): both
    workers stop gracefully after one dispatch group (process 0 flushes
    the Orbax checkpoint + accumulators to the shared filesystem), a
    second 2-process run resumes it, and process 0's outputs equal an
    uninterrupted single-process run."""
    import json
    import numpy as np
    from sdr_pmr446_tpu import config as C
    from sdr_pmr446_tpu.io import iq as iq_io, synth, wav
    from sdr_pmr446_tpu.apps import scan_batch

    caps = []
    for s, (ch, code) in enumerate([(5, 12), (9, 20)]):
        iq = 0.8 * synth.make_scanner_iq(12 * C.SUBCHUNK_IN, channel=ch,
                                         ctcss_code=code, seed=s)
        pth = str(tmp_path / f"rcap{s}.cs16")
        iq_io.write_iq(pth, iq, "cs16")
        caps.append(pth)

    ref_dir = str(tmp_path / "ref")
    assert scan_batch.main(caps + ["--out-dir", ref_dir, "--mesh", "2,2",
                                   "--subchunks-per-step", "4"]) == 0

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "PYTHONPATH": os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))),
    })
    env.pop("JAX_NUM_CPU_DEVICES", None)
    worker_py = tmp_path / "sbr_worker.py"
    worker_py.write_text(_SB_WORKER)
    ckpt = str(tmp_path / "mh.ck")

    def run_pair(outdirs, extra):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        addr = f"127.0.0.1:{port}"
        e = dict(env, SB_EXTRA=json.dumps(extra))
        procs = [subprocess.Popen(
            [sys.executable, str(worker_py), addr, str(pid), outdirs[pid]]
            + caps, env=e, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for pid in range(2)]
        logs = [p.communicate(timeout=540) for p in procs]
        for pid, (p, (so, se)) in enumerate(zip(procs, logs)):
            assert p.returncode == 0, (
                f"worker {pid} failed:\n{se.decode()[-3000:]}")

    run_pair([str(tmp_path / f"p{pid}") for pid in range(2)],
             ["--checkpoint", ckpt, "--stop-after", "1"])
    assert os.path.exists(ckpt) and os.path.exists(ckpt + ".accum.npz")

    outdirs = [str(tmp_path / f"r{pid}") for pid in range(2)]
    run_pair(outdirs, ["--checkpoint", ckpt, "--resume"])
    for s in range(2):
        a_ref, _ = wav.read_wav(os.path.join(ref_dir, f"rcap{s}.wav"))
        a_mh, _ = wav.read_wav(os.path.join(outdirs[0], f"rcap{s}.wav"))
        assert len(a_mh) == len(a_ref)
        np.testing.assert_allclose(a_mh, a_ref, rtol=0, atol=2e-3)
        ev_ref = open(os.path.join(ref_dir, f"rcap{s}.events.log")).read()
        ev_mh = open(os.path.join(outdirs[0],
                                  f"rcap{s}.events.log")).read()
        assert ev_mh == ev_ref
