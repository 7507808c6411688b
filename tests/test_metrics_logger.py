"""MetricsLogger CSV sink: alternating train/validation key sets must
still produce one parseable CSV (header = growing union of fields)."""

import csv

from m2tts_tpu.utils.metrics_logger import MetricsLogger


def _read(path):
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        return list(reader.fieldnames or []), list(reader)


def test_csv_header_grows_with_new_fields(tmp_path):
    ml = MetricsLogger(tmp_path, backend="csv")
    ml.log({"loss": 1.0, "mel_loss": 0.5}, step=1)
    ml.log({"val_total_loss": 2.0}, step=2)  # different key set
    ml.log({"loss": 0.9, "mel_loss": 0.4}, step=3)
    ml.close()

    fields, rows = _read(tmp_path / "metrics.csv")
    assert set(fields) >= {"step", "loss", "mel_loss", "val_total_loss"}
    assert len(rows) == 3
    # every row aligns under the union header; absent cells are blank
    assert rows[0]["loss"] == "1.0" and rows[0]["val_total_loss"] == ""
    assert rows[1]["val_total_loss"] == "2.0" and rows[1]["loss"] == ""
    assert rows[2]["loss"] == "0.9"
    assert [r["step"] for r in rows] == ["1", "2", "3"]


def test_csv_append_across_logger_instances(tmp_path):
    ml = MetricsLogger(tmp_path, backend="csv")
    ml.log({"loss": 1.0}, step=1)
    ml.close()
    # a resumed run reuses the file; a new field triggers one rewrite
    ml2 = MetricsLogger(tmp_path, backend="csv")
    ml2.log({"loss": 0.5, "val_loss": 0.7}, step=2)
    ml2.close()

    fields, rows = _read(tmp_path / "metrics.csv")
    assert set(fields) >= {"step", "loss", "val_loss"}
    assert len(rows) == 2
    assert rows[0]["loss"] == "1.0" and rows[0]["val_loss"] == ""
    assert rows[1]["val_loss"] == "0.7"
