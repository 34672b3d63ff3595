"""ParameterManager tests — parity oracle: reference
``test/test-parameter-manager.cpp`` (save -> clear -> load -> compare)."""

import jax.numpy as jnp

from mvslam_tpu.config import ParameterManager, epsilon, taylor_threshold, tolerance


def test_save_load_roundtrip(tmp_path):
    pm = ParameterManager()
    pm.set_value("VisualOdometer", "frame_queue_size", 10)
    pm.set_value("VisualOdometer", "max_error", 0.5)
    pm.set_value("ImagePair", "refine_structure_in_constructor", "false")
    path = str(tmp_path / "system.param")
    saved = pm.save_to_file(path)
    assert saved == 3

    pm2 = ParameterManager()
    loaded = pm2.load_from_file(path)
    assert loaded == 3
    assert pm2.module_count() == 2
    assert pm2.get_value("VisualOdometer", "frame_queue_size", 0) == 10
    assert pm2.get_value("VisualOdometer", "max_error", 0.0) == 0.5
    assert pm2.get_value("ImagePair", "refine_structure_in_constructor", True) is False


def test_defaults_and_types(tmp_path):
    pm = ParameterManager()
    assert pm.get_value("NoModule", "nothing", 42) == 42
    assert pm.get_value("NoModule", "nothing", 0.5) == 0.5
    pm.DEBUG_set_module_parameters("M", {"a": "1.5", "b": "TRUE", "c": "-3"})
    assert pm.get_value("M", "a", 0.0) == 1.5
    assert pm.get_value("M", "b", False) is True
    assert pm.get_value("M", "c", 0) == -3
    # positive-scalar bool semantics (reference base/conversion.hpp:48-74)
    pm.DEBUG_set_module_parameters("M", {"d": "0.1", "e": "0"})
    assert pm.get_value("M", "d", False) is True
    assert pm.get_value("M", "e", True) is False


def test_ini_format(tmp_path):
    path = tmp_path / "p.param"
    path.write_text("[Mod]\nkey = value with spaces\nnum = 7\n\n[Other]\nx = 1\n")
    pm = ParameterManager()
    assert pm.load_from_file(str(path)) == 3
    assert pm.get_value("Mod", "key", "") == "value with spaces"
    assert pm.get_value("Mod", "num", 0) == 7
    assert pm.get_value("Other", "x", 0) == 1


def test_numeric_constants():
    assert epsilon(jnp.float64) < epsilon(jnp.float32)
    assert tolerance(jnp.float32) == 1000 * epsilon(jnp.float32)
    assert taylor_threshold(jnp.float64) == 1e-5
    assert taylor_threshold(jnp.float32) > taylor_threshold(jnp.float64)
