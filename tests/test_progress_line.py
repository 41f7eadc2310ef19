"""Live progress bar (the reference's tqdm-loss-bar counterpart)."""

import io
import sys

from scd_resnet_tpu.core.logging import ProgressLine


def test_progress_line_writes_and_clears(monkeypatch):
    buf = io.StringIO()
    monkeypatch.setattr(sys, "stderr", buf)
    bar = ProgressLine(enabled=True)
    bar.update(10, 100, 18.5)
    out = buf.getvalue()
    assert "it 10/100" in out and "ips 18.50" in out and "loss   -" in out
    bar.update(11, 100, 18.6, loss=1.2345)
    assert "loss 1.2345" in buf.getvalue()
    # loss sticks until the next sync point hands over a new value
    bar.update(12, 100, 18.7)
    assert buf.getvalue().count("1.2345") == 2
    bar.clear()
    assert buf.getvalue().endswith("\r\033[K")


def test_progress_line_env_gate(monkeypatch):
    monkeypatch.setenv("SCD_PROGRESS", "0")
    assert ProgressLine().enabled is False
    monkeypatch.setenv("SCD_PROGRESS", "1")
    assert ProgressLine().enabled is True
