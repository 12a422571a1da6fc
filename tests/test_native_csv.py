"""Native CSV-matrix parser vs numpy (skipped when not built)."""
import numpy as np
import pytest

from dstagnn_drought_tpu.data.native import load_dense_csv, native_available


def test_fallback_works_regardless(tmp_path):
    p = tmp_path / "m.csv"
    np.savetxt(p, np.arange(12.0).reshape(3, 4), delimiter=",")
    np.testing.assert_array_equal(
        load_dense_csv(str(p)), np.arange(12.0).reshape(3, 4)
    )


@pytest.mark.skipif(not native_available(), reason="libcsv_matrix.so not built")
class TestNative:
    def test_matches_numpy(self, tmp_path, rng):
        M = rng.normal(size=(37, 53)) * 10.0 ** rng.integers(-8, 8, (37, 53))
        p = tmp_path / "m.csv"
        np.savetxt(p, M, delimiter=",")
        np.testing.assert_allclose(
            load_dense_csv(str(p)),
            np.loadtxt(p, delimiter=","),
            rtol=1e-15,
        )

    def test_no_trailing_newline(self, tmp_path):
        p = tmp_path / "m.csv"
        p.write_text("1,2\n3,4")
        np.testing.assert_array_equal(load_dense_csv(str(p)), [[1, 2], [3, 4]])

    def test_crlf_and_exponents(self, tmp_path):
        p = tmp_path / "m.csv"
        p.write_text("1e-3,-2.5E2\r\n0.0,3.25\r\n")
        np.testing.assert_allclose(
            load_dense_csv(str(p)), [[0.001, -250.0], [0.0, 3.25]]
        )

    def test_ragged_rejected(self, tmp_path):
        p = tmp_path / "m.csv"
        p.write_text("1,2,3\n4,5\n")
        with pytest.raises(IOError):
            load_dense_csv(str(p))

    def test_missing_file(self):
        with pytest.raises(IOError):
            load_dense_csv("/nonexistent/file.csv")
