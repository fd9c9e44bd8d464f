"""Metric/monitoring utilities (libyana-pattern parity)."""

import json
import os

import numpy as np

from hocon.exp.args import save_args
from hocon.train.metrics import AverageMeters, MetricWriter, StepTimer


def test_average_meters():
    m = AverageMeters()
    m.update({"a": 1.0, "b": 2.0})
    m.update({"a": 3.0, "b": float("nan")})  # NaN values are skipped
    avg = m.averages()
    assert avg["a"] == 2.0 and avg["b"] == 2.0
    m.reset()
    assert m.averages() == {}


def test_metric_writer_roundtrip(tmp_path):
    w = MetricWriter(str(tmp_path))
    w.log_step(1, {"loss": np.float32(2.5)})
    w.log_epoch(0, "train", {"loss": 2.5})
    w.log_epoch(0, "val", {"loss": 3.0})
    w.plot_curves()
    w.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert json.loads(lines[0])["loss"] == 2.5
    hist = json.load(open(tmp_path / "epochs.json"))
    assert len(hist) == 2 and hist[1]["split"] == "val"
    assert os.path.exists(tmp_path / "plots" / "loss.png")

    # Reopening appends to the same history (resume behavior).
    w2 = MetricWriter(str(tmp_path))
    w2.log_epoch(1, "train", {"loss": 2.0})
    assert len(json.load(open(tmp_path / "epochs.json"))) == 3
    w2.close()


def test_save_args(tmp_path):
    class A:
        lr = 0.1
        name = "x"

    a = A()
    a.__dict__.update(lr=0.1, name="x", bf16=True, steps=16,
                      weird=object())
    save_args(a, str(tmp_path))
    txt = open(tmp_path / "opt.txt").read()
    assert "lr: 0.1" in txt
    # opt.json round-trips NATIVE types (a dump of all-repr strings could
    # not be reloaded as a typed config); repr only for non-JSON values.
    d = json.load(open(tmp_path / "opt.json"))
    assert d["name"] == "x" and d["lr"] == 0.1
    assert d["bf16"] is True and d["steps"] == 16
    assert isinstance(d["weird"], str)
