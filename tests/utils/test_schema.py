from pathlib import Path

import pytest

from segmantic_tpu.utils import config
from segmantic_tpu.utils.schema import (
    default_args_from_signature,
    validate_against_signature,
)


def fn(
    *,
    datalist: Path,
    output_dir: Path = Path("out"),
    num_classes: int = 0,
    tissue_list: Path = None,
    mixed_precision: bool = True,
):
    return locals()


def test_default_args():
    defaults = default_args_from_signature(fn)
    assert defaults["datalist"] == "<required option: Path>"
    assert defaults["output_dir"] == "out"
    assert defaults["num_classes"] == 0
    assert defaults["tissue_list"] is None
    assert defaults["mixed_precision"] is True


def test_validate_args_casts_paths():
    valid = validate_against_signature(
        {"datalist": "d.json", "num_classes": 3, "tissue_list": None}, fn
    )
    assert valid["datalist"] == Path("d.json")
    assert valid["num_classes"] == 3
    assert valid["tissue_list"] is None


def test_validate_args_rejects_unknown():
    with pytest.raises(ValueError, match="Unexpected argument bogus"):
        validate_against_signature({"bogus": 1}, fn)


def test_config_roundtrip(tmp_path: Path):
    data = {"a": 1, "b": [1, 2, 3], "c": {"d": "x"}}
    for name in ["c.yaml", "c.yml", "c.json"]:
        p = tmp_path / name
        config.dump(data, p)
        assert config.load(p) == data


def test_defaults_dump_load_roundtrip(tmp_path: Path):
    defaults = default_args_from_signature(fn)
    p = tmp_path / "cfg.yml"
    config.dump(defaults, p)
    loaded = config.load(p)
    assert loaded == defaults
