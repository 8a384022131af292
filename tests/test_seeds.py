import pytest

from mauvealigner_tpu.seeds import (
    CODING_SEED,
    SOLID_SEED,
    default_mer_size,
    default_seed_weight,
    get_seed,
    seed_family,
)


@pytest.mark.parametrize("weight", range(5, 26))
@pytest.mark.parametrize("rank", [0, 1, 2])
def test_spaced_seeds_valid(weight, rank):
    s = get_seed(weight, rank)
    assert s.weight == weight
    assert s.is_palindromic, f"{s.pattern} not palindromic"
    assert s.pattern[0] == "1" and s.pattern[-1] == "1"
    assert s.length >= weight


def test_seed_family_distinct_lengths():
    fam = seed_family(15)
    lengths = [s.length for s in fam]
    assert lengths == sorted(lengths, reverse=True)
    assert len(set(s.pattern for s in fam)) == 3


def test_solid_seed():
    s = get_seed(9, SOLID_SEED)
    assert s.pattern == "1" * 9


def test_coding_seed():
    s = get_seed(12, CODING_SEED)
    assert s.is_palindromic
    assert s.weight == 12
    assert set(s.pattern) == {"0", "1"}
    # period-3 wobble layout
    assert s.pattern.startswith("11011")


def test_default_weights():
    assert 12 <= default_seed_weight(4.6e6) <= 17
    assert 20 <= default_mer_size(4.6e6) <= 24
    assert default_seed_weight(10) >= 5
