"""Aux subsystem tests: profiler window, device feed, metric writer."""

import glob
import os

import numpy as np
import pytest

from hm_retrieval_tpu.data.device_feed import device_feed
from hm_retrieval_tpu.utils.profiling import StepProfiler
from hm_retrieval_tpu.utils.summary import MetricWriter


class TestStepProfiler:
    def test_trace_window_writes_files(self, tmp_path):
        prof = StepProfiler(str(tmp_path), window=(2, 4))
        for step in range(6):
            prof.on_step(step)
        prof.close()
        # jax profiler writes plugins/profile/... under the logdir
        found = glob.glob(
            str(tmp_path / "**" / "*.xplane.pb"), recursive=True
        )
        assert found, os.listdir(tmp_path)

    def test_disabled_window_is_noop(self, tmp_path):
        prof = StepProfiler(str(tmp_path), window=None)
        for step in range(5):
            prof.on_step(step)
        prof.close()
        assert os.listdir(tmp_path) == []

    def test_strided_steps_still_open_window(self, tmp_path):
        """Chunked dispatch advances global_step by steps_per_dispatch,
        so on_step may never hit the window start exactly — the
        range-based start must still open (and close) the trace."""
        prof = StepProfiler(str(tmp_path), window=(100, 110))
        for step in range(0, 512, 64):  # 64, 128, ... never == 100
            prof.on_step(step)
        prof.close()
        found = glob.glob(
            str(tmp_path / "**" / "*.xplane.pb"), recursive=True
        )
        assert found, os.listdir(tmp_path)

    def test_close_stops_open_trace(self, tmp_path):
        prof = StepProfiler(str(tmp_path), window=(0, 100))
        prof.on_step(0)  # starts, never reaches stop step
        prof.close()  # must not raise / leak an active trace
        prof2 = StepProfiler(str(tmp_path), window=(0, 1))
        prof2.on_step(0)
        prof2.on_step(1)
        prof2.close()


class TestDeviceFeed:
    def test_yields_all_batches_in_order(self):
        batches = [{"x": np.full(4, i)} for i in range(10)]
        out = list(device_feed(iter(batches), prefetch=2))
        assert len(out) == 10
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), i)

    def test_zero_prefetch_path(self):
        batches = [{"x": np.arange(3)}]
        out = list(device_feed(iter(batches), prefetch=0))
        assert len(out) == 1

    def test_producer_exception_propagates(self):
        def gen():
            yield {"x": np.arange(3)}
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            list(device_feed(gen(), prefetch=2))


class TestMetricWriter:
    def test_writes_event_files(self, tmp_path):
        w = MetricWriter(str(tmp_path), run_name="r")
        w.add_scalar("loss", 1.0, 0)
        w.add_scalar("loss", 0.5, 1)
        w.flush()
        w.close()
        files = glob.glob(str(tmp_path / "r" / "events.out*"))
        assert files

    def test_none_logdir_is_noop(self):
        w = MetricWriter(None)
        w.add_scalar("x", 1.0, 0)
        w.add_params_histograms({"a": np.ones(3)}, 0)
        w.close()

    def test_param_histograms_written(self, tmp_path):
        w = MetricWriter(str(tmp_path), run_name="h")
        w.add_params_histograms(
            {"t": {"w": np.ones((4, 2)), "b": np.zeros(2)}}, 1
        )
        w.flush()
        w.close()
        assert glob.glob(str(tmp_path / "h" / "events.out*"))
