"""Unit tests for the accuracy-certificate machinery (scripts/accuracy_cert.py).

The certificate compares fast f32 fits against stored host-f64 reference
fits; these tests pin the compare/artifact logic itself (hash guard,
embedded-x roundtrip, metric math) without running any fit.
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.fixture()
def cert():
    import accuracy_cert

    return accuracy_cert


def _write_artifact(path, x, ld):
    np.savez_compressed(
        path,
        x=np.asarray(x, dtype=np.float32),
        log_density=np.asarray(ld, dtype=np.float64),
        x_sha=__import__("hashlib").sha256(
            np.ascontiguousarray(np.asarray(x, dtype=np.float32)).tobytes()
        ).hexdigest(),
        n_landmarks=7,
        x64=True,
    )


def test_compare_metrics(tmp_path, cert):
    rng = np.random.RandomState(0)
    x = rng.randn(50, 3).astype(np.float32)
    ld = rng.randn(50)
    path = str(tmp_path / "a.npz")
    _write_artifact(path, x, ld)

    ident = cert.compare(ld, artifact=path, x_np=x)
    assert ident["log_density_corr_vs_f64"] == 1.0
    assert ident["rmse_frac_of_spread_vs_f64"] == 0.0

    noisy = ld + 0.01 * rng.randn(50)
    out = cert.compare(noisy, artifact=path, x_np=x)
    assert 0.9 < out["log_density_corr_vs_f64"] < 1.0
    expected_rmse = np.sqrt(np.mean((noisy - ld) ** 2)) / (ld.max() - ld.min())
    assert out["rmse_frac_of_spread_vs_f64"] == pytest.approx(
        expected_rmse, abs=1e-6
    )


def test_compare_rejects_wrong_data(tmp_path, cert):
    rng = np.random.RandomState(1)
    x = rng.randn(20, 2).astype(np.float32)
    path = str(tmp_path / "a.npz")
    _write_artifact(path, x, rng.randn(20))
    with pytest.raises(RuntimeError, match="different data"):
        cert.compare(rng.randn(20), artifact=path, x_np=x + 1.0)


def test_compare_none_when_no_artifact(tmp_path, cert):
    assert cert.compare(np.zeros(3), artifact=str(tmp_path / "nope.npz")) is None
    assert cert.artifact_x(artifact=str(tmp_path / "nope.npz")) is None


def test_artifact_x_roundtrip(tmp_path, cert):
    rng = np.random.RandomState(2)
    x = rng.randn(10, 4).astype(np.float32)
    path = str(tmp_path / "a.npz")
    _write_artifact(path, x, rng.randn(10))
    np.testing.assert_array_equal(cert.artifact_x(artifact=path), x)


def test_named_reference_roundtrip(tmp_path, cert, monkeypatch):
    # named artifacts live under benchdata/ref_<name>_f64.npz
    monkeypatch.setattr(
        cert, "named_path", lambda name: str(tmp_path / f"ref_{name}_f64.npz")
    )
    rng = np.random.RandomState(3)
    x = rng.randn(15, 2).astype(np.float32)
    t = (np.arange(15) % 3).astype(np.float32)
    ld = rng.randn(15)
    np.savez_compressed(
        cert.named_path("demo"), x=x, times=t, log_density=ld
    )
    xr, tr = cert.named_x("demo")
    np.testing.assert_array_equal(xr, x)
    np.testing.assert_array_equal(tr, t)
    assert cert.named_x("absent") is None
    out = cert.compare_named("demo", ld)
    assert out["log_density_corr_vs_f64"] == 1.0
    assert cert.compare_named("absent", ld) is None
