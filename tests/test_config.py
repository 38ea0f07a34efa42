import textwrap

import pytest

from generativedensification_tpu.config import (
    default_config,
    from_dotlist,
    load_config,
    merge,
    to_dict,
)
from generativedensification_tpu.config.confignode import ConfigNode, save_yaml


def test_defaults_mirror_reference_schema():
    cfg = default_config()
    assert cfg.model.k_num == 12000
    assert cfg.model.dec_channels == [160, 256]
    assert cfg.train.lr == 4e-4
    assert cfg.model.non_leaf_ratio == [0.8]
    assert cfg.n_views == 4


def test_interpolation():
    cfg = default_config()
    assert cfg.train_dataset.n_group == 4
    cfg.n_views = 2
    assert cfg.train_dataset.n_group == 2


def test_dotlist_overrides():
    ov = from_dotlist(["model.k_num=8000", "train.lr=1e-5", "gpu_id=[0,1]"])
    cfg = merge(default_config(), ov)
    assert cfg.model.k_num == 8000
    assert cfg.train.lr == 1e-5
    assert cfg.gpu_id == [0, 1]


def test_merge_deep_overrides_keep_siblings():
    cfg = merge(default_config(), {"model": {"sh_degree": 2}})
    assert cfg.model.sh_degree == 2
    assert cfg.model.k_num == 12000  # untouched sibling


def test_yaml_roundtrip(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        textwrap.dedent(
            """
            n_views: 2
            model:
              k_num: 64
            """
        )
    )
    cfg = load_config([str(p)], ["train.batch_size=1"])
    assert cfg.n_views == 2
    assert cfg.model.k_num == 64
    assert cfg.train.batch_size == 1
    assert cfg.test_dataset.n_group == 2  # interpolation across merged tree

    out = tmp_path / "dump.yaml"
    save_yaml(cfg, str(out))
    cfg2 = load_config([str(out)])
    assert to_dict(cfg2)["model"]["k_num"] == 64


def test_missing_key_raises():
    cfg = ConfigNode({"a": 1})
    with pytest.raises(AttributeError):
        _ = cfg.nope
    assert cfg.get("nope", 7) == 7
