"""Fault-injected dry-run of the unattended hardware-recert ladder.

VERDICT round-3 item 6: tools/hw_recert.sh had never executed end-to-end
(the axon tunnel has been down since late round 2), so its step timeouts,
done-markers, probe-abort, and resume-after-kill logic were unproven.
These tests drive the REAL script with a stubbed backend probe and
stubbed step commands (HW_RECERT_STUB_DIR) and assert every control-flow
path the one real tunnel-uptime window will depend on.
"""

import os
import subprocess
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "tools" / "hw_recert.sh"
STEPS = [
    "bench",
    "smoke",
    "ser",
    "protocols",
    "trellis",
    "demod",
    "multistream",
    "msscale",
    "profile",
    "meshsoak",
]


def make_stubs(stub_dir: Path, fail=(), hang=(), probe_fail_after=None):
    """Create stub probe + step scripts.

    probe_fail_after=N: probe succeeds for the first N invocations, then
    fails (simulates the tunnel flapping mid-ladder).
    """
    stub_dir.mkdir(parents=True, exist_ok=True)
    count = stub_dir / "probe_count"
    if probe_fail_after is not None:
        (stub_dir / "probe.sh").write_text(
            "#!/bin/bash\n"
            f'c=$(cat "{count}" 2>/dev/null || echo 0)\n'
            f'echo $((c + 1)) > "{count}"\n'
            f"[ $c -lt {probe_fail_after} ]\n"
        )
    else:
        (stub_dir / "probe.sh").write_text("#!/bin/bash\nexit 0\n")
    for s in STEPS:
        if s in hang:
            body = "#!/bin/bash\nsleep 999\n"
        elif s in fail:
            body = f"#!/bin/bash\necho {s} exploded\nexit 1\n"
        else:
            body = f"#!/bin/bash\necho {s} ran ok\n"
        (stub_dir / f"{s}.sh").write_text(body)


def run_recert(logdir: Path, stub_dir: Path, launched: Path, arg="all", tmo="20"):
    env = dict(
        os.environ,
        HW_RECERT_LOGDIR=str(logdir),
        HW_RECERT_STUB_DIR=str(stub_dir),
        HW_RECERT_LAUNCHED_MARKER=str(launched),
        HW_RECERT_STUB_TMO=tmo,
    )
    return subprocess.run(
        ["bash", str(SCRIPT), arg],
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )


@pytest.fixture()
def paths(tmp_path):
    launched = tmp_path / "launched"
    launched.write_text("")
    return tmp_path / "logs", tmp_path / "stubs", launched


def test_full_ladder_success(paths):
    logdir, stubs, launched = paths
    make_stubs(stubs)
    r = run_recert(logdir, stubs, launched)
    assert r.returncode == 0, r.stdout + r.stderr
    for s in STEPS:
        assert (logdir / f"{s}.done").exists(), s
        assert f"{s} ran ok" in (logdir / f"{s}.log").read_text()
    assert "== summary ==" in r.stdout
    assert r.stdout.count(": OK") >= len(STEPS)
    assert launched.exists()  # only cleared on probe-abort


def test_failed_step_does_not_block_rest_and_resume_redoes_it(paths):
    logdir, stubs, launched = paths
    make_stubs(stubs, fail={"trellis"})
    r = run_recert(logdir, stubs, launched)
    assert r.returncode == 0
    assert "== trellis: FAILED" in r.stdout
    assert not (logdir / "trellis.done").exists()
    # later steps still ran (one flaky tool must not sink the ladder)
    for s in ("demod", "multistream", "meshsoak"):
        assert (logdir / f"{s}.done").exists(), s
    # fix the tool, re-run: completed steps skipped, trellis redone
    make_stubs(stubs)
    r2 = run_recert(logdir, stubs, launched)
    assert r2.returncode == 0
    assert r2.stdout.count("already done") == len(STEPS) - 1
    assert (logdir / "trellis.done").exists()
    assert "trellis ran ok" in (logdir / "trellis.log").read_text()


def test_probe_failure_aborts_and_rearms_watcher(paths):
    logdir, stubs, launched = paths
    # probe ok for the first 3 steps, then the tunnel "flaps"
    make_stubs(stubs, probe_fail_after=3)
    r = run_recert(logdir, stubs, launched)
    assert r.returncode == 3
    for s in STEPS[:3]:
        assert (logdir / f"{s}.done").exists(), s
    for s in STEPS[3:]:
        assert not (logdir / f"{s}.done").exists(), s
    assert "SKIPPED — backend probe failed" in r.stdout
    # the watcher's launch latch must be cleared so it relaunches
    assert not launched.exists()
    # tunnel back: resume completes only the remaining steps
    make_stubs(stubs)
    r2 = run_recert(logdir, stubs, launched)
    assert r2.returncode == 0
    assert r2.stdout.count("already done") == 3
    for s in STEPS:
        assert (logdir / f"{s}.done").exists(), s


def test_hung_step_times_out_and_resumes(paths):
    logdir, stubs, launched = paths
    make_stubs(stubs, hang={"smoke"})
    r = run_recert(logdir, stubs, launched, tmo="1")
    assert r.returncode == 0
    assert "== smoke: FAILED" in r.stdout
    assert not (logdir / "smoke.done").exists()
    assert (logdir / "meshsoak.done").exists()
    make_stubs(stubs)
    r2 = run_recert(logdir, stubs, launched)
    assert r2.returncode == 0
    assert (logdir / "smoke.done").exists()


def test_single_step_selection(paths):
    logdir, stubs, launched = paths
    make_stubs(stubs)
    r = run_recert(logdir, stubs, launched, arg="ser")
    assert r.returncode == 0
    assert (logdir / "ser.done").exists()
    for s in STEPS:
        if s != "ser":
            assert not (logdir / f"{s}.done").exists(), s


def test_kill_mid_step_then_resume(paths):
    """Simulate the whole ladder process being killed mid-step (driver
    restart, OOM-kill): the in-flight step has no marker, earlier ones
    do, and a fresh invocation resumes exactly there."""
    logdir, stubs, launched = paths
    make_stubs(stubs, hang={"protocols"})
    env = dict(
        os.environ,
        HW_RECERT_LOGDIR=str(logdir),
        HW_RECERT_STUB_DIR=str(stubs),
        HW_RECERT_LAUNCHED_MARKER=str(launched),
        HW_RECERT_STUB_TMO="30",
    )
    proc = subprocess.Popen(
        ["bash", str(SCRIPT), "all"],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,
    )
    # wait for it to reach the hanging step, then kill the process group
    import time

    deadline = time.time() + 60
    while time.time() < deadline and not (logdir / "protocols.log").exists():
        time.sleep(0.2)
    assert (logdir / "protocols.log").exists(), "never reached step 4"
    os.killpg(proc.pid, 9)
    proc.wait(timeout=30)
    assert (logdir / "ser.done").exists()
    assert not (logdir / "protocols.done").exists()
    make_stubs(stubs)  # un-hang
    r2 = run_recert(logdir, stubs, launched)
    assert r2.returncode == 0
    assert r2.stdout.count("already done") == 3
    for s in STEPS:
        assert (logdir / f"{s}.done").exists(), s
