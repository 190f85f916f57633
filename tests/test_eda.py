"""EDA tests: seasonal stats, annual cycles, Spearman machinery vs scipy."""

import numpy as np
import pytest
from scipy import stats as sps

from probunet_tpu.eda import ClimexEDA, spearman_corr
from probunet_tpu.eda.climex_eda import SEASONS, season_of_doy
from probunet_tpu.data.synthetic import generate_climex_like


class TestSpearman:
    def test_matches_scipy(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(200)
        y = 0.5 * x + rng.standard_normal(200)
        ours = spearman_corr(x, y)
        ref = sps.spearmanr(x, y).statistic
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_broadcasting(self):
        rng = np.random.default_rng(1)
        field = rng.standard_normal((4, 5, 100))
        ref = rng.standard_normal(100)
        out = spearman_corr(field, ref[None, None, :])
        assert out.shape == (4, 5)
        np.testing.assert_allclose(out[2, 3], sps.spearmanr(field[2, 3], ref).statistic,
                                   rtol=1e-6)

    def test_perfect_correlation(self):
        x = np.arange(50.0)
        np.testing.assert_allclose(spearman_corr(x, x * 3 + 2), 1.0, rtol=1e-6)
        np.testing.assert_allclose(spearman_corr(x, -x), -1.0, rtol=1e-6)


class TestSeasons:
    def test_season_of_doy(self):
        assert season_of_doy(np.array([0]))[0] == "DJF"     # Jan 1
        assert season_of_doy(np.array([59]))[0] == "MAM"    # Mar 1 (noleap: 31+28=59)
        assert season_of_doy(np.array([180]))[0] == "JJA"   # late June
        assert season_of_doy(np.array([364]))[0] == "DJF"   # Dec 31


class TestClimexEDA:
    @pytest.fixture(scope="class")
    def eda(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("climex_eda")
        generate_climex_like(str(d), years=(2000, 2001), grid=16, days_per_year=365)
        return ClimexEDA(str(d), years=[2000, 2001], coords=(0, 16, 0, 16))

    def test_seasonal_mean(self, eda):
        out = eda.interannual_stat_ppp_seasonal("mean")
        assert set(out) == set(eda.variables)
        for s in SEASONS:
            assert out["pr"][s].shape == (16, 16)
            assert np.all(out["pr"][s] >= 0)
        # tasmax climatology must exceed tasmin everywhere
        for s in SEASONS:
            assert np.all(out["tasmax"][s] > out["tasmin"][s])

    def test_seasonal_median_and_extremes(self, eda):
        med = eda.interannual_stat_ppp_seasonal("median")
        lo = eda.interannual_stat_ppp_seasonal("min")
        hi = eda.interannual_stat_ppp_seasonal("max")
        q1 = eda.interannual_stat_ppp_seasonal("1st-quartile")
        for s in SEASONS:
            assert np.all(lo["tasmin"][s] <= q1["tasmin"][s] + 1e-5)
            assert np.all(q1["tasmin"][s] <= med["tasmin"][s] + 1e-5)
            assert np.all(med["tasmin"][s] <= hi["tasmin"][s] + 1e-5)

    def test_unknown_stat_raises(self, eda):
        with pytest.raises(ValueError):
            eda.interannual_stat_ppp_seasonal("mode")

    def test_annual_cycle(self, eda):
        out = eda.annual_cycle_along_dim("rlat")
        assert out["tasmin"].shape == (365, 16)
        # synthetic seasonality: mid-year (sin peak ~ doy 91) warmer than doy 0
        assert out["tasmin"][91].mean() > out["tasmin"][0].mean()
        with pytest.raises(ValueError):
            eda.annual_cycle_along_dim("bogus")

    def test_spearman_map(self, eda):
        out = eda.spearmancorr_seasonal_fop(pxl_coords=(8, 8))
        for s in SEASONS:
            m = out["tasmin"][s]
            assert m.shape == (16, 16)
            np.testing.assert_allclose(m[8, 8], 1.0, atol=1e-5)  # self-correlation
            assert np.all(m <= 1.0 + 1e-6)

    def test_autocorr(self, eda):
        out = eda.autocorr_spearman_lag_ppp(pxl_coords=(8, 8), max_lag=5)
        for s in SEASONS:
            assert out["tasmin"][s].shape == (5,)
            assert np.all(np.abs(out["tasmin"][s]) <= 1.0 + 1e-6)

    def test_pixel_bounds_check(self, eda):
        with pytest.raises(ValueError):
            eda.spearmancorr_seasonal_fop(pxl_coords=(100, 8))

    def test_plots(self, eda):
        _, (fig, _) = eda.interannual_stat_ppp_seasonal("mean", plot=True)
        assert fig is not None
        _, (fig2, _) = eda.autocorr_spearman_lag_ppp(pxl_coords=(8, 8), max_lag=3, plot=True)
        assert fig2 is not None
        import matplotlib.pyplot as plt
        plt.close("all")
