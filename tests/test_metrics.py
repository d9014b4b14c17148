"""Roofline accounting sanity (SURVEY.md §5.1)."""

import json

from bnn_pynq_tpu.models import get_config
from bnn_pynq_tpu.utils.metrics import (RunMetrics, chip_specs,
                                        mxu_roofline_images_per_sec,
                                        network_macs, roofline_fraction)


def test_network_macs_cnv_exact():
    # hand-computed: conv 1.5552M+28.9014M+10.6168M+14.7456M+2.6542M+0.5898M
    # + dense 0.1311M+0.2621M+0.0051M
    assert network_macs(get_config("cnv-w1a1")) == 59_461_376


def test_network_macs_lfc():
    assert network_macs(get_config("lfc-w1a1")) == \
        784 * 1024 + 2 * 1024 * 1024 + 1024 * 10


def test_roofline_positive():
    cfg = get_config("cnv-w1a1")
    sol = mxu_roofline_images_per_sec(cfg, chip_specs("v5e"))
    assert sol > 1e6  # v5e speed-of-light for CNV is ~3.3M img/s
    assert 0 < roofline_fraction(cfg, sol / 2, chip_specs("v5e")) <= 0.51


def test_run_metrics_emit(tmp_path):
    m = RunMetrics("test").record(a=1.5, b=2)
    line = m.emit(str(tmp_path / "metrics.jsonl"))
    payload = json.loads(line)
    assert payload["a"] == 1.5 and payload["run"] == "test"
    assert (tmp_path / "metrics.jsonl").exists()


def test_mlp_median_aggregation(tmp_path, monkeypatch, capsys):
    """tools/mlp_median.py groups multi-window rows, takes the median,
    reports cross-window spread, and only marks quotable with enough
    windows (the r5 headline-hygiene mechanism)."""
    import json
    import sys
    sys.path.insert(0, str(tmp_path))  # not needed, just path safety
    import tools.mlp_median as mm

    path = tmp_path / "perf.jsonl"
    rows = [
        # three windows of one row (img/s 10, 30, 20 -> median 20)
        {"network": "n", "route": "xla", "batch": 8, "path": "classify",
         "images_per_sec": v, "spread": 0.01, "tag": f"t-w{i}",
         "verify_ok": True}
        for i, v in enumerate([10.0, 30.0, 20.0])
    ] + [
        # a single-window row of another group: not quotable
        {"network": "m", "route": "xla", "batch": 8, "path": "classify",
         "images_per_sec": 5.0, "spread": 0.0, "tag": "t-w0",
         "verify_ok": True},
        # unrelated tag: ignored
        {"network": "n", "route": "xla", "batch": 8, "path": "classify",
         "images_per_sec": 999.0, "spread": 0.0, "tag": "other"},
    ]
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    monkeypatch.setattr(sys, "argv", [
        "mlp_median.py", "--tag-prefix", "t-w", "--min-windows", "3",
        "--path", str(path), "--out-tag", "agg"])
    mm.main()
    out = [json.loads(l) for l in open(path) if l.strip()]
    agg = {r["network"]: r for r in out if r.get("tag") == "agg"}
    assert agg["n"]["images_per_sec_median"] == 20.0
    assert agg["n"]["n_windows"] == 3 and agg["n"]["quotable"]
    assert agg["n"]["window_spread"] == round((30 - 10) / 20.0, 3)
    assert agg["m"]["n_windows"] == 1 and not agg["m"]["quotable"]
