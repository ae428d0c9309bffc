"""Profiling utility tests."""

import os

import jax.numpy as jnp
import numpy as np

from vn_pointcloudcompletion_tpu.utils.profiling import (
    StepTimer,
    device_memory_stats,
    log_compile_time,
    trace,
)


class TestProfiling:
    def test_step_timer_summary(self):
        t = StepTimer(warmup=1)
        for _ in range(5):
            with t:
                sum(range(1000))
        s = t.summary()
        assert s["steps"] == 4
        assert s["mean_s"] > 0 and s["p90_s"] >= s["p50_s"]

    def test_device_memory_stats_shape(self):
        stats = device_memory_stats()
        assert len(stats) >= 1
        assert "device" in stats[0]

    def test_log_compile_time(self):
        import jax

        f = jax.jit(lambda x: jnp.sin(x) * 2)
        first, steady = log_compile_time(f, jnp.ones((64,)))
        assert first > 0 and steady > 0

    def test_trace_writes_files(self, tmp_path):
        import jax

        logdir = str(tmp_path / "tb")
        with trace(logdir):
            jax.jit(lambda x: x * 2)(jnp.ones((32,))).block_until_ready()
        found = []
        for root, _, files in os.walk(logdir):
            found.extend(files)
        assert found  # xplane/trace artifacts exist
