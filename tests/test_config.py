from dataclasses import dataclass, field
from typing import Optional

import pytest

from tssplat_tpu.config import load_config, parse_structured, Registry


YAML = """
expr_name: "alarm"
geometry:
  smooth_eng_coeff: 2e-4
  use_smooth_barrier: true
data:
  image_root: "img_data/${expr_name}"
  total_num_iter: 1500
total_num_iter: ${data.total_num_iter}
"""


class TestLoadConfig:
    def test_interpolation(self):
        cfg = load_config(YAML, from_string=True)
        assert cfg.data.image_root == "img_data/alarm"
        assert cfg.total_num_iter == 1500  # keeps int type

    def test_cli_overrides(self):
        cfg = load_config(YAML, from_string=True,
                          cli_args=["data.total_num_iter=10", "geometry.use_smooth_barrier=false"])
        assert cfg.data.total_num_iter == 10
        assert cfg.total_num_iter == 10  # interpolation resolves after merge
        assert cfg.geometry.use_smooth_barrier is False

    def test_get_default(self):
        cfg = load_config(YAML, from_string=True)
        assert cfg.get("missing", 7) == 7
        assert cfg.get("expr_name") == "alarm"


@dataclass
class SubCfg:
    lr: float = 0.1


@dataclass
class MyCfg:
    name: str
    n: int = 3
    sub: SubCfg = field(default_factory=SubCfg)
    opt: Optional[str] = None


class TestParseStructured:
    def test_defaults_and_nested(self):
        c = parse_structured(MyCfg, {"name": "a", "sub": {"lr": 0.5}})
        assert c.n == 3 and c.sub.lr == 0.5

    def test_unknown_key_rejected(self):
        with pytest.raises(ValueError, match="unknown"):
            parse_structured(MyCfg, {"name": "a", "bogus": 1})

    def test_missing_required(self):
        with pytest.raises(ValueError, match="missing"):
            parse_structured(MyCfg, {})


def test_registry():
    reg = Registry("thing")

    @reg.register("A")
    class A:
        pass

    assert reg("A") is A
    with pytest.raises(KeyError):
        reg("B")


def test_shipped_configs_parse_and_interpolate():
    """Both production configs load, interpolate ${...} refs, and carry the
    reference parity values (reference config/gso.yaml, config/img_to_3D.yaml)."""
    import os
    from tssplat_tpu.config import load_config
    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    gso = load_config(os.path.join(root, "gso.yaml"))
    assert gso.data.batch_size == 120 and gso.total_num_iter == 1500
    assert gso.optimizer.lr == 0.2
    assert gso.optimizer.grad_limit_values == [0.01, 0.01]
    assert gso.geometry.smooth_barrier_param.increase_order_iter == 1000
    i23 = load_config(os.path.join(root, "img_to_3D.yaml"))
    assert i23.data.batch_size == 120 and i23.total_num_iter == 2000
    # ${} interpolation resolved
    assert "${" not in str(gso.output_path) + str(i23.output_path)
