import numpy as np
import pytest

from lac_tpu.ops.quantize import cdf_from_freq_np, quantize_logits_np, rescale_cdf


class TestRescaleCDF:
    def test_identity_when_total_matches(self):
        cdf = [3, 7, 10]
        assert rescale_cdf(cdf, 10) == cdf

    def test_partition_properties(self):
        rng = np.random.default_rng(0)
        for _ in range(200):
            n = rng.integers(2, 40)
            freq = rng.integers(0, 1000, size=n)
            freq[rng.integers(0, n)] += 1  # ensure positive total
            cdf = np.cumsum(freq).tolist()
            denom = int(rng.integers(n, 10 * n + 1000))
            out = rescale_cdf(cdf, denom)
            assert out[-1] == denom
            widths = np.diff([0] + list(out))
            assert (widths >= 1).all()

    def test_rejects_uncodable(self):
        with pytest.raises(ValueError):
            rescale_cdf([1, 2, 3, 4], 3)

    def test_preserves_proportions_roughly(self):
        cdf = np.cumsum([1, 1, 1, 997]).tolist()
        out = rescale_cdf(cdf, 1 << 16)
        widths = np.diff([0] + list(out))
        assert widths[3] > 60000


class TestQuantizeLogits:
    @pytest.mark.parametrize("v,pb", [(256, 16), (32000, 24), (128256, 30)])
    def test_sums_and_floors(self, v, pb):
        rng = np.random.default_rng(1)
        logits = rng.normal(0, 5, size=(4, v)).astype(np.float32)
        freq = quantize_logits_np(logits, pb)
        assert freq.shape == (4, v)
        assert (freq >= 1).all()
        assert (freq.sum(-1) == (1 << pb)).all()

    def test_adversarial_rows(self):
        v, pb = 1000, 20
        rows = np.stack(
            [
                np.zeros(v),                          # uniform
                np.linspace(-100, 100, v),            # huge spread
                np.where(np.arange(v) == 7, 1e4, -1e4),  # one-hot
                np.full(v, -65000.0),                 # extreme negative
            ]
        ).astype(np.float32)
        freq = quantize_logits_np(rows, pb)
        assert (freq >= 1).all()
        assert (freq.sum(-1) == (1 << pb)).all()
        # one-hot row concentrates nearly all mass
        assert freq[2, 7] > (1 << pb) * 0.99

    def test_deterministic(self):
        rng = np.random.default_rng(2)
        logits = rng.normal(size=(2, 512)).astype(np.float32)
        a = quantize_logits_np(logits, 16)
        b = quantize_logits_np(logits.copy(), 16)
        assert (a == b).all()

    def test_cdf_from_freq(self):
        freq = np.array([[1, 2, 3]])
        cdf = cdf_from_freq_np(freq)
        assert cdf.tolist() == [[0, 1, 3, 6]]

    @pytest.mark.parametrize("v,pb", [(256, 14), (32000, 16)])
    def test_det_np_matches_jnp_bit_for_bit(self, v, pb):
        """The det8 frequency construction has a host-side spec holder:
        quantize_logits_np(det=True) (detmath.det_exp_np emulates XLA's FMA
        contraction) must reproduce the jitted det path exactly — the same
        cross-implementation discipline the byte codecs get."""
        import jax.numpy as jnp

        from lac_tpu.ops.quantize import quantize_logits

        rng = np.random.default_rng(5)
        logits = (rng.standard_normal((4, v)) * 6).astype(np.float32)
        a = quantize_logits_np(logits, pb, det=True)
        b = np.asarray(quantize_logits(jnp.asarray(logits), pb, det=True))
        assert (a == b).all()
        assert (a >= 1).all() and (a.sum(-1) == (1 << pb)).all()
