"""Failure detection + elastic recovery (parallel/failure.py) and the
metrics/logging subsystem (utils/metrics.py) — the two SURVEY.md §5 rows
that were 'partial' through round 2. The cross-process detection case
(killed peer hangs the collective) lives in tests/test_multihost.py."""

import io
import json
import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nx_signal_tpu.parallel.failure import (
    FailureDetected,
    heartbeat,
    run_with_recovery,
)
from nx_signal_tpu.utils.metrics import Metrics, ThroughputMeter, log_event


@pytest.fixture
def rng():
    return np.random.default_rng(3)


class TestHeartbeat:
    def test_healthy(self):
        dt = heartbeat(timeout=60.0)
        assert 0.0 <= dt < 60.0

    def test_hang_detected(self):
        with pytest.raises(FailureDetected, match="did not complete"):
            heartbeat(timeout=0.2, probe=lambda: time.sleep(10.0))

    def test_probe_error_wrapped(self):
        def bad():
            raise RuntimeError("peer connection lost")

        with pytest.raises(FailureDetected, match="peer connection lost"):
            heartbeat(timeout=5.0, probe=bad)


class TestRunWithRecovery:
    """Streaming FIR under injected failures: the recovered run must be
    BITWISE identical to an uninterrupted one (the carry checkpoint is
    exact and the overlap-save fold is deterministic)."""

    def _setup(self, rng):
        from nx_signal_tpu.parallel.streaming import StreamingFIR

        taps = rng.normal(size=33).astype(np.float32)
        x = rng.normal(size=(2, 40 * 64)).astype(np.float32)
        fir = StreamingFIR(taps)
        return fir, x

    def _run(self, fir, x, tmp_path, fail_at=None, **kwargs):
        out = np.zeros_like(x)
        state0 = fir.init_state(batch_shape=(2,))
        failures = {"armed": fail_at is not None}

        def step(state, i):
            if failures["armed"] and i == fail_at:
                failures["armed"] = False  # transient: fails exactly once
                raise RuntimeError("injected device preemption")
            new_state, y = fir.process(state, x[:, i * 64 : (i + 1) * 64])
            out[:, i * 64 : (i + 1) * 64] = np.asarray(y)  # idempotent sink
            return new_state

        os.makedirs(tmp_path, exist_ok=True)
        ckpt = os.path.join(tmp_path, "carry.npz")
        run_with_recovery(step, state0, 40, checkpoint_path=ckpt,
                          checkpoint_every=7, **kwargs)
        return out

    def test_bitwise_recovery_after_injected_failure(self, rng, tmp_path):
        fir, x = self._setup(rng)
        clean = self._run(fir, x, str(tmp_path / "a"))
        os.makedirs(tmp_path / "b", exist_ok=True)
        restarts = []
        recovered = self._run(
            fir, x, str(tmp_path / "b"), fail_at=17,
            on_restart=lambda step, exc: restarts.append((step, str(exc))),
        )
        assert restarts and restarts[0][0] == 17
        np.testing.assert_array_equal(recovered, clean)

    def test_resume_from_existing_checkpoint(self, rng, tmp_path):
        from nx_signal_tpu.parallel.streaming import StreamingFIR

        fir, x = self._setup(rng)
        d = str(tmp_path)
        os.makedirs(d, exist_ok=True)
        # phase 1: first 20 blocks, then the "process dies"
        out = np.zeros_like(x)
        state0 = fir.init_state(batch_shape=(2,))

        def make_step(buf):
            def step(state, i):
                new_state, y = fir.process(state, x[:, i * 64 : (i + 1) * 64])
                buf[:, i * 64 : (i + 1) * 64] = np.asarray(y)
                return new_state
            return step

        ckpt = os.path.join(d, "carry.npz")
        run_with_recovery(make_step(out), state0, 20, checkpoint_path=ckpt,
                          checkpoint_every=5)
        # phase 2: fresh loop (simulated restart) resumes at step 20 —
        # blocks 0..19 must NOT be recomputed
        out2 = np.zeros_like(x)
        run_with_recovery(make_step(out2), fir.init_state(batch_shape=(2,)),
                          40, checkpoint_path=ckpt, checkpoint_every=5)
        assert not out2[:, : 20 * 64].any()  # untouched: resumed past them
        clean = self._run(fir, x, str(tmp_path / "clean"))
        np.testing.assert_array_equal(out2[:, 20 * 64:], clean[:, 20 * 64:])

    def test_max_restarts_exceeded(self, rng, tmp_path):
        fir, x = self._setup(rng)

        def always_fail(state, i):
            raise RuntimeError("permanent failure")

        with pytest.raises(RuntimeError, match="permanent failure"):
            run_with_recovery(
                always_fail, fir.init_state(batch_shape=(2,)), 10,
                checkpoint_path=os.path.join(str(tmp_path), "c.npz"),
                max_restarts=2,
            )

    def test_heartbeat_in_loop(self, rng, tmp_path):
        fir, x = self._setup(rng)
        probes = []
        # the loop's heartbeat uses the real probe; healthy mesh -> passes
        out = self._run(fir, x, str(tmp_path), heartbeat_every=10,
                        heartbeat_timeout=60.0)
        clean = self._run(fir, x, str(tmp_path / "c2"))
        np.testing.assert_array_equal(out, clean)


class TestMetrics:
    def test_counters_gauges_timers(self):
        m = Metrics()
        m.count("blocks")
        m.count("blocks", 4)
        m.gauge("chunk_bytes", 1024)
        with m.timer("step"):
            pass
        with m.timer("step"):
            pass
        snap = m.snapshot()
        assert snap["blocks"] == 5
        assert snap["chunk_bytes"] == 1024
        assert snap["step_calls"] == 2
        assert snap["step_seconds"] >= 0.0

    def test_emit_is_one_json_line(self):
        m = Metrics()
        m.count("n", 3)
        buf = io.StringIO()
        m.emit("bench", stream=buf, extra_field="x")
        lines = buf.getvalue().strip().split("\n")
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert rec["event"] == "bench" and rec["n"] == 3
        assert rec["extra_field"] == "x" and "ts" in rec

    def test_log_event(self):
        buf = io.StringIO()
        log_event("step_done", stream=buf, step=7, ms=12.5)
        rec = json.loads(buf.getvalue())
        assert rec == {"event": "step_done", "ts": rec["ts"],
                       "step": 7, "ms": 12.5}

    def test_throughput_meter(self):
        t = ThroughputMeter(n_devices=4)
        t.update(8_000_000, 1.0)
        t.update(8_000_000, 1.0)
        assert t.samples_per_second == pytest.approx(8e6)
        assert t.msamples_per_second_per_chip == pytest.approx(2.0)
        assert t.scaling_efficiency(2.5) == pytest.approx(0.8)
        snap = t.snapshot()
        assert snap["devices"] == 4 and snap["samples"] == 16_000_000

    def test_throughput_meter_default_devices(self):
        t = ThroughputMeter()
        assert t.n_devices == jax.device_count()
