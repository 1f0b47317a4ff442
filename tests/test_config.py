"""Config tests: validation, hashability (jit-static), YAML parity loader."""

import pytest

from ergodic_exploration_tpu.config import EngineConfig, default_config, load_yaml_config


def test_defaults_validate():
    default_config("cart").validate()
    default_config("omni").validate()


def test_config_is_hashable_and_jit_static():
    cfg = default_config("cart")
    assert hash(cfg) == hash(default_config("cart"))
    assert cfg == default_config("cart")


def test_omni_dims():
    cfg = default_config("omni")
    assert cfg.nu == 4
    assert len(cfg.u_min) == 4


def test_validation_rejects_bad_dims():
    with pytest.raises(ValueError):
        EngineConfig(model="omni").validate()  # default tuples are len 2
    with pytest.raises(ValueError):
        EngineConfig(model="quadrotor").validate()


def test_yaml_loader_accepts_reference_param_names():
    cfg = load_yaml_config(
        {
            "model": "cart",
            "wheel_radius": 0.05,
            "wheel_base": 0.25,
            "dt": 0.2,
            "horizon": 15,
            "num_basis": 8,
            "expl_weight": 30.0,
            "buffer_size": 512,
            "batch_size": 128,
            "control_min": [-2.0, -2.0],
            "control_max": 2.0,
            "r": [1.0, 2.0],
            "boundary_radius": 0.3,
            "frequency": 10.0,  # ROS-only param: ignored
            "map_frame": "map",  # ignored
        }
    )
    assert cfg.cart.wheel_radius == 0.05
    assert cfg.cart.wheel_base == 0.25
    assert cfg.dt == 0.2
    assert cfg.horizon == 15
    assert cfg.num_basis == 8
    assert cfg.ergodic_weight == 30.0
    assert cfg.buffer_capacity == 512
    assert cfg.buffer_batch == 128
    assert cfg.u_min == (-2.0, -2.0)
    assert cfg.u_max == (2.0, 2.0)
    assert cfg.r_diag == (1.0, 2.0)
    assert cfg.boundary_radius == 0.3


def test_yaml_loader_from_file(tmp_path):
    p = tmp_path / "omni.yaml"
    p.write_text("model: omni\nwheel_radius: 0.1\nlx: 0.3\nly: 0.2\nhorizon: 25\n")
    cfg = load_yaml_config(str(p))
    assert cfg.model == "omni"
    assert cfg.omni.wheel_radius == 0.1
    assert cfg.horizon == 25
    assert cfg.nu == 4
