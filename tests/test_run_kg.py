"""End-to-end smoke of the spark-submit deployment entry (run_kg.py):
synthetic corpus -> full pipeline -> pred-partitioned triple parquet,
both the direct and the checkpointed path."""

from __future__ import annotations

import os
import sys


def _run(argv: list[str], monkeypatch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import run_kg

    monkeypatch.setattr(sys, "argv", ["run_kg.py", *argv])
    run_kg.main()


def test_run_kg_direct(spark, tmp_path, monkeypatch, capsys):
    out = str(tmp_path / "kg_out")
    _run(
        ["--synthetic", "300", "--output", out, "--cpus", "4",
         "--strategy", "minhash"],
        monkeypatch,
    )
    import json

    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["triples"] > 0
    # pred-partitioned layout (the Iceberg-analog write)
    parts = {d for d in os.listdir(out) if d.startswith("pred=")}
    assert "pred=contains" in parts
    assert len(parts) >= 10, parts  # full K5 predicate vocabulary
    back = spark.read.parquet(out)
    assert back.count() == payload["triples"]
    assert set(back.columns) >= {"subj", "obj", "weight", "prov"}


def test_run_kg_checkpointed(spark, tmp_path, monkeypatch, capsys):
    out = str(tmp_path / "kg_out_ck")
    ck = str(tmp_path / "ckpt")
    _run(
        ["--synthetic", "300", "--output", out, "--checkpoint", ck,
         "--cpus", "4", "--strategy", "exact"],
        monkeypatch,
    )
    import json

    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["triples"] > 0
    # the created_at marker persisted with the checkpoint (round-3 fix)
    assert any(f.startswith("_created_at__") for f in os.listdir(ck))
