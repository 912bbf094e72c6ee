"""Complex-as-pair arithmetic vs numpy complex128."""

import numpy as np
import pytest

from cmtci.utils import cplx


@pytest.fixture
def zw(rng):
    z = rng.normal(size=64) + 1j * rng.normal(size=64)
    w = rng.normal(size=64) + 1j * rng.normal(size=64)
    return z, w


def _check(pair, ref, rtol=1e-14):
    np.testing.assert_allclose(cplx.to_numpy(pair), ref, rtol=rtol, atol=1e-300)


def test_field_ops(zw):
    z, w = zw
    zp, wp = cplx.of(z), cplx.of(w)
    _check(cplx.add(zp, wp), z + w)
    _check(cplx.sub(zp, wp), z - w)
    _check(cplx.mul(zp, wp), z * w)
    _check(cplx.div(zp, wp), z / w)
    _check(cplx.sq(zp), z * z)
    _check(cplx.reciprocal(zp), 1.0 / z)
    _check(cplx.conj(zp), np.conj(z))
    _check(cplx.scale(zp, 2.5), 2.5 * z)


def test_transcendental(zw):
    z, _ = zw
    zp = cplx.of(z)
    _check(cplx.log(zp), np.log(z), rtol=1e-12)
    _check(cplx.exp(zp), np.exp(z), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cplx.absval(zp)), np.abs(z), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(cplx.abs2(zp)), np.abs(z) ** 2, rtol=1e-14)
    _check(cplx.expi(np.asarray([0.5, 1.5])), np.exp(1j * np.asarray([0.5, 1.5])), rtol=1e-14)


def test_where_and_full_like(zw):
    z, w = zw
    zp, wp = cplx.of(z), cplx.of(w)
    mask = np.abs(z) > 1.0
    _check(cplx.where(mask, zp, wp), np.where(mask, z, w))
    _check(cplx.full_like(zp, 2 - 3j), np.full_like(z, 2 - 3j))
