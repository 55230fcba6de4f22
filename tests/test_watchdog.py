"""Stall watchdog in the experiment driver (SURVEY §5 failure recovery).

Round 2 observed the TPU relay hanging runs indefinitely mid-step; the
driver now kills a silent child by exact PID and relaunches from the
periodic checkpoint.  These tests drive run_with_watchdog with stub
child processes.
"""
import os
import sys

sys.path.insert(0, "/root/repo")
from scripts.run import run_with_watchdog


def test_healthy_child_passes_through(tmp_path):
    log = str(tmp_path / "a.log")
    rc = run_with_watchdog(
        [sys.executable, "-c", "print('done')"], log,
        str(tmp_path / "no_ckpt"), stall_s=30, poll_s=0.2)
    assert rc == 0
    assert "done" in open(log).read()


def test_stalled_child_killed_and_restarted(tmp_path):
    log = str(tmp_path / "b.log")
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    marker = tmp_path / "ran_twice"
    # first run: prints then hangs silently; restart (which gets
    # --start_checkpoint appended) sees the marker and exits cleanly
    child = (
        "import os, sys, time\n"
        f"m = {str(marker)!r}\n"
        "if os.path.exists(m) or '--start_checkpoint' in sys.argv:\n"
        "    print('resumed ok'); sys.exit(0)\n"
        "open(m, 'w').close()\n"
        "print('hanging', flush=True)\n"
        "time.sleep(300)\n"
    )
    rc = run_with_watchdog([sys.executable, "-c", child], log, str(ckpt),
                           stall_s=5, max_restarts=2, poll_s=0.3)
    assert rc == 0
    txt = open(log).read()
    assert "hanging" in txt and "watchdog restart 1" in txt
    assert "resumed ok" in txt


def test_gives_up_after_max_restarts(tmp_path):
    log = str(tmp_path / "c.log")
    rc = run_with_watchdog(
        [sys.executable, "-c", "import time; time.sleep(300)"], log,
        str(tmp_path / "no_ckpt"), stall_s=1, max_restarts=1, poll_s=0.2)
    assert rc == 1
