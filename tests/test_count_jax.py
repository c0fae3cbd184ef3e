"""JAX extraction/counting vs the NumPy reference (bit-exact contract)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from genome_assembler_tpu.ops import count_jax, kmer_jax, kmer_ref
from genome_assembler_tpu.utils.dna import key_words


def _random_reads(seed, b, length):
    return np.random.default_rng(seed).integers(0, 4, size=(b, length)).astype(np.uint8)


@settings(deadline=None, max_examples=15)
@given(st.integers(0, 2**32 - 1), st.sampled_from([15, 21, 25, 31, 41]))
def test_extract_matches_numpy_ref(seed, k):
    reads = _random_reads(seed, 4, k + 23)
    got = np.asarray(kmer_jax.extract_kmers(reads, k, canonical=True))
    fwd, rc = kmer_ref.extract_kmer_words_np(reads, k)
    want = kmer_ref.canonical_min_np(fwd, rc)
    np.testing.assert_array_equal(got, want)


def test_extract_forward_only():
    reads = _random_reads(3, 2, 40)
    k = 21
    got = np.asarray(kmer_jax.extract_kmers(reads, k, canonical=False))
    fwd, _ = kmer_ref.extract_kmer_words_np(reads, k)
    np.testing.assert_array_equal(got, fwd)


def test_extract_flat_masks_padding_rows():
    reads = _random_reads(4, 6, 32)
    k = 25
    keys, valid = kmer_jax.extract_canonical_flat(reads, k, np.int32(4))
    keys, valid = np.asarray(keys), np.asarray(valid)
    wc = 32 - k + 1
    assert valid[: 4 * wc].all() and not valid[4 * wc :].any()
    assert (keys[4 * wc :] == 0xFFFFFFFF).all()


@settings(deadline=None, max_examples=15)
@given(st.integers(0, 2**32 - 1), st.sampled_from([15, 21, 31, 41]))
def test_count_keys_matches_numpy(seed, k):
    reads = _random_reads(seed, 5, k + 19)
    keys, valid = kmer_jax.extract_canonical_flat(reads, k)
    table = count_jax.count_keys(np.asarray(keys))
    num = int(table.num_unique)
    want_words, want_counts = kmer_ref.count_unique_np(
        kmer_ref.extract_canonical_np(reads, k)
    )
    assert num == len(want_words)
    np.testing.assert_array_equal(np.asarray(table.words)[:num], want_words)
    np.testing.assert_array_equal(np.asarray(table.counts)[:num], want_counts)
    # padding rows are sentinel/zero
    assert (np.asarray(table.words)[num:] == 0xFFFFFFFF).all()
    assert (np.asarray(table.counts)[num:] == 0).all()


def test_count_keys_with_invalid_lanes():
    k = 21
    reads = _random_reads(7, 4, 40)
    keys, _ = kmer_jax.extract_canonical_flat(reads, k, np.int32(2))
    table = count_jax.count_keys(np.asarray(keys))
    want_words, want_counts = kmer_ref.count_unique_np(
        kmer_ref.extract_canonical_np(reads[:2], k)
    )
    num = int(table.num_unique)
    assert num == len(want_words)
    np.testing.assert_array_equal(np.asarray(table.words)[:num], want_words)
    np.testing.assert_array_equal(np.asarray(table.counts)[:num], want_counts)


def test_merge_tables_equals_joint_count():
    k = 25
    a = _random_reads(11, 8, 50)
    b = _random_reads(12, 8, 50)
    keys_a, _ = kmer_jax.extract_canonical_flat(a, k)
    keys_b, _ = kmer_jax.extract_canonical_flat(b, k)
    cap = keys_a.shape[0] + keys_b.shape[0]
    table = count_jax.empty_table(cap, key_words(k))
    table = count_jax.merge_tables(table, count_jax.count_keys(np.asarray(keys_a)))
    table = count_jax.merge_tables(table, count_jax.count_keys(np.asarray(keys_b)))
    joint = count_jax.count_keys(
        np.concatenate([np.asarray(keys_a), np.asarray(keys_b)], axis=0)
    )
    num = int(table.num_unique)
    assert num == int(joint.num_unique)
    np.testing.assert_array_equal(
        np.asarray(table.words)[:num], np.asarray(joint.words)[:num]
    )
    np.testing.assert_array_equal(
        np.asarray(table.counts)[:num], np.asarray(joint.counts)[:num]
    )
    assert not bool(table.overflow)


def test_merge_raw_keys_equals_count_then_merge():
    # the streaming fast path must be bit-identical to count_keys +
    # merge_tables, including invalid (sentinel) lanes in the stream
    k = 25
    a = _random_reads(21, 8, 50)
    b = _random_reads(22, 8, 50)
    keys_a, _ = kmer_jax.extract_canonical_flat(a, k)
    # mask two of b's rows so the raw stream carries sentinel lanes
    keys_b, _ = kmer_jax.extract_canonical_flat(b, k, np.int32(6))
    cap = keys_a.shape[0] + keys_b.shape[0]
    table = count_jax.empty_table(cap, key_words(k))
    table = count_jax.merge_raw_keys(table, np.asarray(keys_a))
    table = count_jax.merge_raw_keys(table, np.asarray(keys_b))
    want = count_jax.empty_table(cap, key_words(k))
    want = count_jax.merge_tables(want, count_jax.count_keys(np.asarray(keys_a)))
    want = count_jax.merge_tables(want, count_jax.count_keys(np.asarray(keys_b)))
    np.testing.assert_array_equal(np.asarray(table.words), np.asarray(want.words))
    np.testing.assert_array_equal(np.asarray(table.counts), np.asarray(want.counts))
    assert int(table.num_unique) == int(want.num_unique)
    assert not bool(table.overflow)


def test_merge_raw_keys_overflow_flag():
    k = 15
    reads = _random_reads(23, 4, 40)
    keys, _ = kmer_jax.extract_canonical_flat(reads, k)
    tiny = count_jax.empty_table(3, key_words(k))
    merged = count_jax.merge_raw_keys(tiny, np.asarray(keys))
    assert bool(merged.overflow)


def test_merge_overflow_flag():
    k = 15
    reads = _random_reads(13, 4, 40)
    keys, _ = kmer_jax.extract_canonical_flat(reads, k)
    batch = count_jax.count_keys(np.asarray(keys))
    tiny = count_jax.empty_table(3, key_words(k))
    merged = count_jax.merge_tables(tiny, batch)
    assert bool(merged.overflow)
    with pytest.raises(RuntimeError, match="overflow"):
        from genome_assembler_tpu.models.pipeline import table_to_host_counts

        table_to_host_counts(merged, k)


def test_filter_table():
    k = 21
    w = key_words(k)
    words = np.array([[0, 5], [0, 9], [1, 2], [3, 4]], dtype=np.uint32)
    assert words.shape[1] == w
    counts = np.array([5, 1, 3, 2], dtype=np.int32)
    table = count_jax.CountTable(
        words=np.pad(words, ((0, 2), (0, 0)), constant_values=0xFFFFFFFF),
        counts=np.pad(counts, (0, 2)),
        num_unique=np.int32(4),
        overflow=np.asarray(False),
    )
    out = count_jax.filter_table(table, 3)
    assert int(out.num_unique) == 2
    np.testing.assert_array_equal(
        np.asarray(out.words)[:2], [[0, 5], [1, 2]]
    )
    np.testing.assert_array_equal(np.asarray(out.counts)[:2], [5, 3])


def test_snug_capacity_grid():
    from genome_assembler_tpu.ops.count_jax import snug_capacity

    floor = 1 << 16
    assert snug_capacity(0) == floor
    assert snug_capacity(floor) == floor
    assert snug_capacity(floor + 1) == floor * 5 // 4
    # grid = {1, 1.25, 1.5, 1.75} x 2^k, always >= n, <= 25% overhead
    for n in (100_000, 1_000_000, 9_300_000, (1 << 22) + 1, 1 << 25):
        cap = snug_capacity(n)
        assert cap >= n
        assert cap <= n * 1.25 + 1
    assert snug_capacity(1 << 20) == 1 << 20


def test_compact_table_preserves_counts_and_order():
    import numpy as np

    from genome_assembler_tpu.ops.count_jax import (
        compact_table,
        count_keys,
    )
    from genome_assembler_tpu.ops.kmer_jax import extract_canonical_flat
    from genome_assembler_tpu.utils.simulate import (
        simulate_genome,
        simulate_reads,
    )

    genome = simulate_genome(800, seed=3)
    rs = simulate_reads(genome, coverage=10, read_len=60, seed=4)
    keys, _ = extract_canonical_flat(rs.codes, 21)
    table = count_keys(keys)
    compacted = compact_table(table)
    # snug: capacity shrinks to the floor grid value, rows preserved
    assert compacted.words.shape[0] <= table.words.shape[0]
    n = int(table.num_unique)
    assert int(compacted.num_unique) == n
    np.testing.assert_array_equal(
        np.asarray(compacted.words)[:n], np.asarray(table.words)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(compacted.counts)[:n], np.asarray(table.counts)[:n]
    )
    # idempotent
    again = compact_table(compacted)
    assert again.words.shape == compacted.words.shape


def test_snug_capacity_fine_grid():
    from genome_assembler_tpu.ops.count_jax import snug_capacity

    floor = 1 << 16
    assert snug_capacity(0, fine=True) == floor
    for n in [floor + 1, 4_641_652, 10_000_001, (1 << 22) + 7]:
        cap = snug_capacity(n, fine=True)
        assert cap >= n
        assert cap <= snug_capacity(n)  # never coarser than the 1/4 grid
        assert (cap - n) / n <= 0.0626  # <= 6.25% padding
    assert snug_capacity(1 << 20, fine=True) == 1 << 20
