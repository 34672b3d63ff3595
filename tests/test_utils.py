"""StateEstimate containers + string utilities (reference
``math/state-estimate.hpp``, ``base/string-manipulation.cpp``,
``base/conversion.hpp``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvslam_tpu.math.lie import SE3
from mvslam_tpu.math.state_estimate import (
    StateEstimate,
    TransformationEstimate,
    point2_estimate,
    point3_estimate,
)
from mvslam_tpu.utils import strings


def test_state_estimate_info_is_inverse_covar():
    covar = jnp.diag(jnp.asarray([4.0, 9.0, 16.0]))
    est = StateEstimate(jnp.zeros(3), covar)
    np.testing.assert_allclose(
        np.asarray(est.info()), np.diag([0.25, 1 / 9, 1 / 16]), atol=1e-12
    )


def test_point_estimates_isotropic():
    p3 = point3_estimate(jnp.zeros((5, 3)), stddev=0.5)
    assert p3.covar.shape == (5, 3, 3)
    np.testing.assert_allclose(np.asarray(p3.covar[0]), 0.25 * np.eye(3))
    p2 = point2_estimate(jnp.zeros((7, 2)), stddev=2.0)
    np.testing.assert_allclose(np.asarray(p2.covar[3]), 4.0 * np.eye(2))


def test_transformation_estimate():
    est = TransformationEstimate(SE3.identity(), 1e-4 * jnp.eye(6))
    np.testing.assert_allclose(np.asarray(est.info()), 1e4 * np.eye(6),
                               rtol=1e-6)


def test_string_trim_and_case():
    assert strings.string_trim_whitespaces("  ab c \t\n") == "ab c"
    assert strings.string_to_upper("aBc") == "ABC"
    assert strings.string_to_lower("aBc") == "abc"
    assert strings.string_is_alphabet("abc")
    assert not strings.string_is_alphabet("ab1")
    assert not strings.string_is_alphabet("")


@pytest.mark.parametrize(
    "s,ok",
    [
        ("3.25", True),
        ("-1e-3", True),
        ("42", True),
        ("  7.0  ", True),
        ("abc", False),
        ("", False),
        ("inf", False),
        ("nan", False),
    ],
)
def test_string_is_scalar(s, ok):
    assert strings.string_is_scalar(s) == ok


def test_convert_to_bool_reference_semantics():
    # reference conversion.hpp:48-74: TRUE/FALSE literals or sign of scalar
    assert strings.convert_to_bool("TRUE") is True
    assert strings.convert_to_bool("false") is False
    assert strings.convert_to_bool("1.5") is True
    assert strings.convert_to_bool("0") is False
    assert strings.convert_to_bool("-3") is False
    assert strings.string_is_boolean("TRUE")
    assert strings.string_is_boolean("0.5")
    assert not strings.string_is_boolean("maybe")
    with pytest.raises(ValueError):
        strings.convert_to_bool("maybe")
