"""REAL two-OS-process writer-lease proof (VERDICT r12 next #5).

The lease protocol (sidecar.acquire/verify/release_writer_lease) is
unit-proven in-process and on the in-memory conditional store; these
tests race two independently-launched Python/Spark driver PROCESSES on
one tmpdir lease via the file provider, asserting the two properties
the protocol exists for:

- single-winner: two writers racing acquisition get exactly one lease;
  the loser aborts loudly BEFORE touching the artifact.
- loser-abort at the commit point: a holder stalled past the staleness
  window (SIGSTOP — the whole process freezes, heartbeat included) is
  stolen by a second writer; when the zombie resumes, its commit-point
  ``verify_writer_lease`` raises instead of writing over the thief.

Coordination is marker files in a tmpdir (no sockets); each subprocess
builds its own small SparkSession, so the test costs two JVM boots.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Each writer role below is one OS process: get_session -> act -> write
# outcome markers into the sync dir. Outcome files, not exit codes,
# carry the assertions so a crash is distinguishable from a clean loss.
WRITER_SCRIPT = r"""
import os, sys, time
sys.path.insert(0, sys.argv[1])
role, sync, lease_url, mode = sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5]

from etlutils_spark.session import get_session
from etlutils_spark.sources.sidecar import (
    acquire_writer_lease, release_writer_lease, verify_writer_lease,
)

spark = get_session(
    f"lease_{role}",
    **{
        "spark.driver.memory": "1g",
        "spark.sql.shuffle.partitions": "2",
        "spark.ui.enabled": "false",
    },
)


def mark(name, text=""):
    tmp = os.path.join(sync, f".{name}.tmp")
    with open(tmp, "w") as fh:
        fh.write(text)
    os.replace(tmp, os.path.join(sync, name))


def wait_for(name, timeout=120.0):
    deadline = time.time() + timeout
    p = os.path.join(sync, name)
    while not os.path.exists(p):
        if time.time() > deadline:
            raise TimeoutError(name)
        time.sleep(0.05)
    with open(p) as fh:
        return fh.read()


if mode == "race":
    # both processes spin on the same GO marker so the acquire calls
    # overlap as tightly as file-mtime polling allows
    mark(f"{role}_booted")
    wait_for("go")
    try:
        token = acquire_writer_lease(spark, lease_url, stale_after_sec=600.0)
    except ValueError as e:
        mark(f"{role}_lost", str(e))
    else:
        mark(f"{role}_won", token)
        # hold until the OTHER process reports, so a win-release-win
        # sequence can't masquerade as mutual exclusion
        other = "b" if role == "a" else "a"
        for _ in range(2400):
            if os.path.exists(os.path.join(sync, f"{other}_won")) or \
               os.path.exists(os.path.join(sync, f"{other}_lost")):
                break
            time.sleep(0.05)
        release_writer_lease(spark, lease_url, token)
    mark(f"{role}_done")
elif mode == "steal_holder":
    # acquire with a short staleness window, then wait to be SIGSTOPped
    # by the test and stolen by the other process; on resume, the
    # commit-point verify MUST abort
    token = acquire_writer_lease(spark, lease_url, stale_after_sec=2.0)
    mark("a_acquired", token)
    wait_for("b_stole", timeout=180.0)
    try:
        verify_writer_lease(spark, lease_url, token)
    except ValueError as e:
        mark("a_commit_aborted", str(e))
    else:
        mark("a_commit_allowed")
    mark("a_done")
elif mode == "steal_thief":
    wait_for("steal_now", timeout=180.0)
    # the holder is frozen and its lease mtime is past stale_after: the
    # rename steal must pick this process as the one winner. The FS
    # protocol's staleness window is the CALLER's parameter (it does
    # not ride the record), so the thief must judge with the same 2 s
    # window the deployment agreed on.
    token = acquire_writer_lease(spark, lease_url, stale_after_sec=2.0)
    mark("b_stole", token)
    wait_for("a_done", timeout=180.0)
    release_writer_lease(spark, lease_url, token)
    mark("b_done")
spark.stop()
"""


def _launch(role: str, sync: str, lease_url: str, mode: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", WRITER_SCRIPT, REPO, role, sync, lease_url, mode],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


def _wait_marker(sync: str, name: str, proc_list, timeout: float = 180.0) -> str:
    deadline = time.time() + timeout
    path = os.path.join(sync, name)
    while not os.path.exists(path):
        for p in proc_list:
            if p.poll() not in (None, 0):
                out = p.communicate()[0]
                raise AssertionError(
                    f"writer process died (rc={p.returncode}) waiting for "
                    f"{name}:\n{out[-4000:]}"
                )
        if time.time() > deadline:
            raise TimeoutError(f"marker {name} never appeared")
        time.sleep(0.1)
    with open(path) as fh:
        return fh.read()


def _drain(*procs) -> None:
    for p in procs:
        try:
            p.communicate(timeout=60)
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()


def test_lease_race_two_processes_single_winner(tmp_path):
    sync = str(tmp_path / "sync")
    os.makedirs(sync)
    lease_url = str(tmp_path / "artifact.lease")
    a = _launch("a", sync, lease_url, "race")
    b = _launch("b", sync, lease_url, "race")
    try:
        _wait_marker(sync, "a_booted", [a, b])
        _wait_marker(sync, "b_booted", [a, b])
        with open(os.path.join(sync, "go"), "w"):
            pass
        _wait_marker(sync, "a_done", [a, b])
        _wait_marker(sync, "b_done", [a, b])
    finally:
        _drain(a, b)
    outcomes = {
        r: os.path.exists(os.path.join(sync, f"{r}_won")) for r in ("a", "b")
    }
    assert sum(outcomes.values()) == 1, f"expected exactly one winner: {outcomes}"
    loser = "a" if outcomes["b"] else "b"
    msg = open(os.path.join(sync, f"{loser}_lost")).read()
    assert "another writer holds the lease" in msg
    assert a.returncode == 0 and b.returncode == 0
    # released cleanly: the lease file is gone
    assert not os.path.exists(lease_url)


def test_lease_stalled_holder_stolen_and_commit_aborts(tmp_path):
    """SIGSTOP freezes the holder (driver + heartbeat thread) past its
    2 s staleness window; the thief's rename-steal wins; the resumed
    zombie's commit-point verify aborts instead of writing over it."""
    if not hasattr(signal, "SIGSTOP"):
        pytest.skip("no SIGSTOP on this platform")
    sync = str(tmp_path / "sync")
    os.makedirs(sync)
    lease_url = str(tmp_path / "artifact.lease")
    a = _launch("a", sync, lease_url, "steal_holder")
    b = _launch("b", sync, lease_url, "steal_thief")
    try:
        _wait_marker(sync, "a_acquired", [a, b])
        os.kill(a.pid, signal.SIGSTOP)
        try:
            time.sleep(3.5)  # > stale_after_sec=2 with margin
            with open(os.path.join(sync, "steal_now"), "w"):
                pass
            _wait_marker(sync, "b_stole", [b])
        finally:
            os.kill(a.pid, signal.SIGCONT)
        _wait_marker(sync, "a_done", [a, b])
        _wait_marker(sync, "b_done", [a, b])
    finally:
        _drain(a, b)
    assert os.path.exists(os.path.join(sync, "a_commit_aborted")), (
        "the stalled holder committed over the thief"
    )
    msg = open(os.path.join(sync, "a_commit_aborted")).read()
    assert "abort" in msg.lower()
    assert a.returncode == 0 and b.returncode == 0
