"""Config system: 5-group schema, dotted access, overrides, typo warning."""

import logging

import pytest

from m2tts_tpu.utils.config import Config, load_config, save_config


def test_dotted_get_set():
    cfg = Config({"a": {"b": {"c": 1}}})
    assert cfg.get("a.b.c") == 1
    assert cfg.get("a.b.missing", 7) == 7
    cfg.set("a.b.d", 2)
    assert cfg.get("a.b.d") == 2


def test_has_path():
    cfg = Config({"a": {"b": 1}})
    assert cfg.has_path("a") and cfg.has_path("a.b")
    assert not cfg.has_path("a.c") and not cfg.has_path("x")
    assert not cfg.has_path("a.b.c")  # scalar has no children


def test_overrides_parse_yaml_values():
    cfg = Config({"t": {"lr": 1e-4, "steps": 10, "flag": False}})
    out = cfg.apply_overrides(["t.lr=3e-5", "t.steps=20", "t.flag=true"])
    assert out.get("t.lr") == 3e-5
    assert out.get("t.steps") == 20
    assert out.get("t.flag") is True
    assert cfg.get("t.steps") == 10  # original untouched


def test_override_unknown_key_warns(caplog):
    cfg = Config({"data": {"data_dir": "x"}})
    with caplog.at_level(logging.WARNING, logger="m2tts_tpu.utils.config"):
        out = cfg.apply_overrides(["data.train_dir=/tmp/y"])
    assert out.get("data.train_dir") == "/tmp/y"  # still applied
    assert any("does not exist" in r.message and "data_dir" in r.message
               for r in caplog.records)


def test_override_known_key_silent(caplog):
    cfg = Config({"data": {"data_dir": "x"}})
    with caplog.at_level(logging.WARNING, logger="m2tts_tpu.utils.config"):
        cfg.apply_overrides(["data.data_dir=/tmp/y"])
    assert not caplog.records


def test_bad_override_format_raises():
    with pytest.raises(ValueError, match="key=value"):
        Config({}).apply_overrides(["noequals"])


def test_load_save_roundtrip(tmp_path):
    cfg = Config({"model": {"dim": 64}, "training": {"steps": 5}})
    save_config(cfg, tmp_path / "c.yaml")
    back = load_config(tmp_path / "c.yaml")
    assert back.to_dict() == cfg.to_dict()
