"""Property-based tests for pure-python engine components (no Spark)."""

from hypothesis import given, settings, strategies as st

from hybridbackend_spark.operators.dedup import _MERSENNE_P, _affine_coeffs
from hybridbackend_spark.schema import Field, fields_to_struct


@given(st.integers(1, 128), st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_affine_coeffs_deterministic_and_in_range(k, seed):
    a = _affine_coeffs(k, seed)
    b = _affine_coeffs(k, seed)
    assert a == b and len(a) == k
    for x, y in a:
        assert 1 <= x < _MERSENNE_P - 1 and 0 <= y < _MERSENNE_P - 1
        # affine map output stays in signed-64 territory pre-modulo
        assert (_MERSENNE_P - 1) * x + y < 2**63


@given(
    st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")), min_size=1, max_size=20),
    st.sampled_from(["int8", "int32", "int64", "uint32", "uint64", "float32", "float64", "string"]),
    st.integers(0, 3),
)
@settings(max_examples=50, deadline=None)
def test_field_struct_roundtrip(name, dtype, rank):
    f = Field(name, dtype, ragged_rank=rank)
    st_type = fields_to_struct([f])
    assert st_type.fields[0].name == name
    depth = 0
    t = st_type.fields[0].dataType
    while t.typeName() == "array":
        depth += 1
        t = t.elementType
    assert depth == rank


@given(st.integers(-(2**40), 2**40), st.integers(1, 10**6))
@settings(max_examples=50, deadline=None)
def test_pmod_semantics_match_oracle_form(x, n):
    # the ((x % n) + n) % n form used in every oracle equals Spark's pmod
    assert ((x % n) + n) % n == x % n if x >= 0 else ((x % n) + n) % n >= 0


@given(st.integers(0, 2**31 - 1))
@settings(max_examples=25, deadline=None)
def test_pq_codebooks_deterministic_and_shaped(seed):
    from hybridbackend_spark.operators.similarity import pq_random_codebooks

    a = pq_random_codebooks(dim=64, m=4, ksub=8, seed=seed)
    b = pq_random_codebooks(dim=64, m=4, ksub=8, seed=seed)
    assert a == b
    assert len(a) == 4 and all(len(bk) == 8 for bk in a)
    assert all(len(c) == 16 for bk in a for c in bk)


@given(st.lists(st.integers(0, 255), min_size=2, max_size=12),
       st.integers(1, 6))
@settings(max_examples=30, deadline=None)
def test_morton_key_monotone_in_single_dim(vals, bits):
    """With the other dimension fixed at 0, the Morton key is monotone in
    the remaining dimension (bit interleave preserves per-dim order)."""
    top = (1 << bits) - 1

    def morton(x):
        x = min(max(x, 0), top)
        k = 0
        for b in range(bits):
            k |= ((x >> b) & 1) << (2 * b)
        return k

    keys = [morton(v * top // 255) for v in sorted(vals)]
    assert keys == sorted(keys)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1,
        max_size=40,
    )
)
@settings(max_examples=50, deadline=None)
def test_ewma_fold_semantics_match_python(vals):
    # the engine-exact claim rests on this recurrence being the fold both
    # engines run: s <- (s + v) / 2, seeded with the first value
    acc = vals[0]
    for v in vals[1:]:
        acc = (acc + v) / 2.0
    # magnitude never exceeds the running max (convexity of the mean)
    assert abs(acc) <= max(abs(v) for v in vals) + 1e-9


@given(st.integers(1, 10**12), st.integers(1, 10**12))
@settings(max_examples=100, deadline=None)
def test_whole_bit_log_identity(a, b):
    # floor(log2 x) == len(bin(x)) - 1 (the arithmetic behind surprisal,
    # WOE/IV, PSI, novelty, idf) — and the bit difference brackets the
    # real log2 ratio within 1 bit on each side
    import math

    bits = lambda x: len(bin(x)) - 3  # '0b1...' -> digit count - 1
    assert bits(a) == math.floor(math.log2(a))
    diff = bits(a) - bits(b)
    assert abs(diff - math.log2(a / b)) < 2


@given(
    st.integers(2, 64),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=50, deadline=None)
def test_geometric_noise_bounded_and_deterministic(width, u):
    # the DP geometric mechanism's leading-ones noise: |noise| <= bits(u)
    import re

    b = bin(u)[2:]
    k = len(re.match("^1*", b).group(0)) - 1
    sign = 1 if u % 2 == 0 else -1
    noise = sign * max(k, -1 if u == 0 else k)
    assert abs(noise) <= len(b)


@given(
    st.lists(st.integers(0, 10**6), min_size=2, max_size=200),
    st.integers(2, 8),
)
@settings(max_examples=30, deadline=None)
def test_dyadic_interpolation_exact_in_double(vals, log_bins):
    # the winsorize/equidepth exactness argument: a + (b - a) * (k/2^m)
    # on integer grids is EXACT in double (no rounding) — check against
    # Fraction arithmetic
    from fractions import Fraction

    n_bins = 2 ** (log_bins.bit_length() - 1) or 2
    a, b = min(vals), max(vals)
    for k in range(1, n_bins):
        f = k / n_bins
        got = a + (b - a) * f
        want = Fraction(a) + Fraction(b - a) * Fraction(k, n_bins)
        assert got == float(want) == want
