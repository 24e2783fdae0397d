"""tools/timing_verifier.py logic, exercised end-to-end on CPU.

On CPU the timing channel is real (block_until_ready is honest), so the
full pipeline — calibration, chain run, replay, on-device comparator,
stopwatch verdict — runs and must return VERIFIED; with --inject-error
the mismatch path must make the spin visibly slower (SELF-TEST-OK).
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

# small spin so the factor-8 discrimination stays fast but visible on CPU
# (large enough that scheduler noise cannot cross the 8x gap)
_ARGS = ["--k", "1", "--steps", "2", "--spin-dim", "128",
         "--spin-iters", "2000"]


def test_verifier_verifies_clean_run(capsys):
    import timing_verifier
    rc = timing_verifier.main(_ARGS)
    outp = capsys.readouterr().out
    assert '"verdict": "VERIFIED"' in outp, outp
    assert rc == 0


def test_verifier_flags_injected_error(capsys):
    import timing_verifier
    rc = timing_verifier.main(_ARGS + ["--inject-error"])
    outp = capsys.readouterr().out
    assert '"verdict": "SELF-TEST-OK"' in outp, outp
    assert rc == 0
