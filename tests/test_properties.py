"""Property-based tests (hypothesis) — the SURVEY §5 "Property-based" row.

The reference has essentially no property corpus; these pin the pure-math
invariants our engine's verdicts hang on, with no Spark session needed:

- ``mostly`` success-rule monotonicity + count invariants
  (``result.calc_map_success``)
- merge(partials) == global on randomly partitioned counters
  (``checkpoint.merge_map_counts`` — the resumability contract)
- p-value functions bounded in [0, 1] and monotone in the statistic
  (``profile.chi2_sf`` / ``kolmogorov_sf``), ppf/cdf inverse parity
- multimodal codec round-trips on arbitrary pixel/sample arrays
  (PPM/BMP/WAV encode∘decode == id; concatenated-P6 stream parsing)
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from great_expectations_spark.checkpoint import merge_map_counts
from great_expectations_spark.operators import multimodal as M
from great_expectations_spark.profile import _norm_ppf, chi2_sf, kolmogorov_sf
from great_expectations_spark.result import calc_map_success

# counters: element >= missing, unexpected <= element - missing
counters = st.integers(0, 10**6).flatmap(
    lambda ec: st.tuples(
        st.just(ec),
        st.integers(0, ec),
    ).flatmap(
        lambda en: st.tuples(
            st.just(en[0]), st.just(en[1]), st.integers(0, en[0] - en[1])
        )
    )
)


@given(counters, st.floats(0.0, 1.0), st.floats(0.0, 1.0))
def test_mostly_monotonicity(c, m1, m2):
    """If the suite passes at the STRICTER (larger) mostly, it passes at
    every weaker one; mostly=None is the strictest rule of all."""
    ec, nc, ux = c
    lo, hi = min(m1, m2), max(m1, m2)
    if calc_map_success(ec, nc, ux, hi):
        assert calc_map_success(ec, nc, ux, lo)
    if calc_map_success(ec, nc, ux, None):
        assert calc_map_success(ec, nc, ux, lo)
        assert ux == 0


@given(counters, st.one_of(st.none(), st.floats(0.0, 1.0)))
def test_mostly_boundary_semantics(c, mostly):
    """success ⇔ (1 - ux/nonnull) >= mostly (None ⇔ ux == 0); vacuous
    all-null domains succeed."""
    ec, nc, ux = c
    got = calc_map_success(ec, nc, ux, mostly)
    nonnull = ec - nc
    if mostly is None:
        assert got == (ux == 0)
    elif nonnull <= 0:
        assert got is True
    else:
        # the reference's exact arithmetic form (pass_ratio >= mostly);
        # same float expression so boundary rounding can't flake
        assert got == ((nonnull - ux) / nonnull >= mostly)


@given(
    st.lists(counters, min_size=1, max_size=20),
    st.one_of(st.none(), st.floats(0.0, 1.0)),
)
def test_merge_partials_equals_global(parts, mostly):
    """Summing per-partition counters then re-evaluating the rule must
    equal evaluating on the global counters — the property that makes
    per-partition EVRs sufficient state for checkpoint resume."""
    dicts = [
        {"element_count": ec, "missing_count": nc, "unexpected_count": ux}
        for ec, nc, ux in parts
    ]
    merged = merge_map_counts(dicts, mostly)
    ec = sum(p[0] for p in parts)
    nc = sum(p[1] for p in parts)
    ux = sum(p[2] for p in parts)
    assert merged["element_count"] == ec
    assert merged["success"] == calc_map_success(ec, nc, ux, mostly)
    # merging is associative: merge(merge(prefix), suffix) == merge(all)
    if len(dicts) > 1:
        pre = merge_map_counts(dicts[:2], mostly)
        again = merge_map_counts([pre] + dicts[2:], mostly)
        assert again == merged


@given(st.floats(0.0, 500.0), st.integers(1, 50))
def test_chi2_sf_bounded_and_monotone(stat, df):
    p = chi2_sf(stat, df)
    assert 0.0 <= p <= 1.0
    assert chi2_sf(stat + 1.0, df) <= p + 1e-12
    assert chi2_sf(0.0, df) == 1.0


@given(st.floats(0.0, 5.0))
def test_kolmogorov_sf_bounded_and_monotone(lam):
    p = kolmogorov_sf(lam)
    assert 0.0 <= p <= 1.0 + 1e-12
    assert kolmogorov_sf(lam + 0.1) <= p + 1e-9


@given(st.floats(1e-6, 1 - 1e-6))
def test_norm_ppf_is_monotone_inverse(p):
    x = _norm_ppf(p)
    assert _norm_ppf(min(1 - 1e-6, p + 1e-4)) >= x - 1e-9
    # round-trip through the normal cdf (erf form)
    import math

    cdf = 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
    assert abs(cdf - p) < 1e-6


# --- codec round-trips (pure numpy, no Spark) -------------------------------

rgb_images = st.tuples(
    st.integers(1, 16), st.integers(1, 16), st.integers(0, 2**32 - 1)
).map(
    lambda t: np.random.default_rng(t[2]).integers(
        0, 256, size=(t[0], t[1], 3), dtype=np.uint8
    )
)


@settings(max_examples=30)
@given(rgb_images)
def test_ppm_roundtrip_property(img):
    back, end = M.decode_ppm(M.encode_ppm(img))
    assert end == len(M.encode_ppm(img))
    assert back.shape == img.shape and (back == img).all()


@settings(max_examples=30)
@given(rgb_images)
def test_bmp_roundtrip_property(img):
    """Exercises the 4-byte row padding across every width mod 4."""
    back = M.decode_bmp(M.encode_bmp(img))
    assert back.shape == img.shape and (back == img).all()


@settings(max_examples=30)
@given(
    st.integers(1, 200),
    st.integers(1, 3),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(0, 2**32 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    samples = np.random.default_rng(seed).integers(
        -32768, 32767, size=(n, ch), dtype=np.int16
    )
    back, got_rate = M.decode_wav(M.encode_wav(samples, rate))
    assert got_rate == rate
    assert back.shape == (n, ch) and (back == samples).all()


@settings(max_examples=20)
@given(st.lists(rgb_images, min_size=1, max_size=6))
def test_concatenated_ppm_stream_parses_all_frames(frames):
    stream = b"".join(M.encode_ppm(f) for f in frames)
    out, off = [], 0
    while off < len(stream):
        img, off = M.decode_ppm(stream, off)
        out.append(img)
    assert len(out) == len(frames)
    for a, b in zip(out, frames):
        assert a.shape == b.shape and (a == b).all()
