"""Tests for the §5 observability utilities (utils/logging, utils/profiling)
and the real-time detection CLI loop (cli/realtime).

The reference's instrumentation is bare prints plus `imutils.FPS`
(`real_time_object_detection.py:31,67-71`); these pin the framework's
replacements — StageTimer, ThroughputMeter, get_logger — and run the
realtime CLI end to end on a tiny synthetic clip.
"""

from __future__ import annotations

import logging

import numpy as np
import pytest

from opticalflowclustering_tpu.utils.logging import get_logger
from opticalflowclustering_tpu.utils.profiling import StageTimer, ThroughputMeter


class TestStageTimer:
    def test_accumulates_totals_and_counts(self, monkeypatch):
        import opticalflowclustering_tpu.utils.profiling as prof

        clock = iter([0.0, 1.0, 10.0, 12.5, 20.0, 20.25])
        monkeypatch.setattr(prof.time, "perf_counter", lambda: next(clock))
        t = StageTimer()
        with t.stage("decode"):
            pass
        with t.stage("flow"):
            pass
        with t.stage("flow"):
            pass
        assert t.counts["decode"] == 1 and t.counts["flow"] == 2
        assert t.totals["decode"] == pytest.approx(1.0)
        assert t.totals["flow"] == pytest.approx(2.5 + 0.25)

    def test_sync_blocks_on_device_value(self):
        import jax.numpy as jnp

        t = StageTimer()
        with t.stage("jit", sync=jnp.arange(8) * 2):
            pass
        assert t.counts["jit"] == 1 and t.totals["jit"] > 0

    def test_report_sorted_by_total_desc(self, monkeypatch):
        import opticalflowclustering_tpu.utils.profiling as prof

        clock = iter([0.0, 0.5, 1.0, 4.0])
        monkeypatch.setattr(prof.time, "perf_counter", lambda: next(clock))
        t = StageTimer()
        with t.stage("small"):
            pass
        with t.stage("big"):
            pass
        lines = t.report().splitlines()
        assert lines[0].startswith("big:") and lines[1].startswith("small:")
        assert "ms/call (1 calls)" in lines[0]


class TestThroughputMeter:
    def test_fps_math(self, monkeypatch):
        import opticalflowclustering_tpu.utils.profiling as prof

        now = {"t": 100.0}
        monkeypatch.setattr(prof.time, "perf_counter", lambda: now["t"])
        m = ThroughputMeter().start()
        m.update(30)
        m.update()  # default n_frames=1
        now["t"] = 102.0
        assert m.elapsed() == pytest.approx(2.0)
        assert m.fps() == pytest.approx(31 / 2.0)

    def test_fps_per_chip_divides_by_local_devices(self, monkeypatch):
        import jax

        import opticalflowclustering_tpu.utils.profiling as prof

        now = {"t": 0.0}
        monkeypatch.setattr(prof.time, "perf_counter", lambda: now["t"])
        m = ThroughputMeter().start()
        m.update(jax.local_device_count() * 10)
        now["t"] = 1.0
        assert m.fps_per_chip() == pytest.approx(10.0)

    def test_zero_elapsed_is_not_a_division_error(self, monkeypatch):
        import opticalflowclustering_tpu.utils.profiling as prof

        monkeypatch.setattr(prof.time, "perf_counter", lambda: 5.0)
        m = ThroughputMeter().start()
        m.update(3)
        assert m.fps() == 0.0


class TestGetLogger:
    def test_handler_attached_once_and_no_propagate(self):
        lg1 = get_logger("ofc_tpu.test_once")
        lg2 = get_logger("ofc_tpu.test_once")
        assert lg1 is lg2
        assert len(lg1.handlers) == 1
        assert lg1.propagate is False
        assert lg1.level == logging.INFO

    def test_emits_formatted_record_to_stderr(self, capsys):
        lg = get_logger("ofc_tpu.test_emit")
        lg.info("stage=%s frames=%d", "flow", 49)
        err = capsys.readouterr().err
        assert "ofc_tpu.test_emit" in err
        assert "INFO" in err and "stage=flow frames=49" in err


@pytest.mark.slow
def test_realtime_cli_end_to_end(tmp_path):
    """cli/realtime.py on a synthetic clip: threaded VideoStream feed,
    batched FlowCellNet windows, FPS report, annotated output video
    (`real_time_object_detection.py:29-71` — headless equivalent)."""
    import cv2

    from opticalflowclustering_tpu.cli.realtime import main
    from opticalflowclustering_tpu.io.video import write_video_mjpg

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(6, 64, 64, 3), dtype=np.uint8)
    src = str(tmp_path / "src.avi")
    write_video_mjpg(src, frames, 30.0)
    out = str(tmp_path / "annotated.avi")

    n = main(["-s", src, "--max-frames", "4", "-o", out, "-c", "0.0"])
    assert 1 <= n <= 4

    cap = cv2.VideoCapture(out)
    got = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (64, 64, 3)
        got += 1
    cap.release()
    assert got == n
