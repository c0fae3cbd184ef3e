"""Edge cases for ops.count_jax (empty, all-sentinel, tiny capacities)."""

import numpy as np

from genome_assembler_tpu.ops import count_jax
from genome_assembler_tpu.ops.kmer_jax import unpack_codes
from genome_assembler_tpu.utils.dna import key_words, pack_codes

SENT = 0xFFFFFFFF


def test_count_all_sentinel():
    keys = np.full((16, 2), SENT, dtype=np.uint32)
    t = count_jax.count_keys(keys)
    assert int(t.num_unique) == 0
    assert (np.asarray(t.counts) == 0).all()


def test_count_single_key_many_lanes():
    keys = np.zeros((64, 2), dtype=np.uint32)
    keys[:, 1] = 7
    t = count_jax.count_keys(keys)
    assert int(t.num_unique) == 1
    assert int(np.asarray(t.counts)[0]) == 64


def test_merge_with_empty_batch():
    t = count_jax.count_keys(
        np.array([[0, 1], [0, 1], [0, 2]], dtype=np.uint32)
    )
    empty = count_jax.empty_table(4, 2)
    merged = count_jax.merge_tables(t, empty)
    assert int(merged.num_unique) == 2
    np.testing.assert_array_equal(np.asarray(merged.counts)[:2], [2, 1])


def test_merge_empty_into_empty():
    a = count_jax.empty_table(4, 2)
    b = count_jax.empty_table(8, 2)
    m = count_jax.merge_tables(a, b)
    assert int(m.num_unique) == 0 and not bool(m.overflow)


def test_filter_all_dropped():
    t = count_jax.count_keys(
        np.array([[0, 1], [0, 2], [0, 3]], dtype=np.uint32)
    )
    f = count_jax.filter_table(t, 2)
    assert int(f.num_unique) == 0
    assert (np.asarray(f.words) == SENT).all()


def test_weighted_count_keys():
    keys = np.array([[0, 5], [0, 5], [0, 9]], dtype=np.uint32)
    weights = np.array([10, 20, 5], dtype=np.int32)
    t = count_jax.count_keys(keys, weights)
    assert int(t.num_unique) == 2
    np.testing.assert_array_equal(np.asarray(t.counts)[:2], [30, 5])


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for length in (1, 3, 4, 7, 100, 101):
        codes = rng.integers(0, 4, size=(5, length), dtype=np.uint8)
        packed = pack_codes(codes)
        assert packed.shape == (5, -(-length // 4))
        out = np.asarray(unpack_codes(packed, length))
        np.testing.assert_array_equal(out, codes)


def test_k63_four_word_keys_end_to_end():
    """k=63 (126-bit keys, W=4): the documented upper bound really works."""
    import numpy as np

    from genome_assembler_tpu.host.traverse import contigs_equal
    from genome_assembler_tpu.models.oracle import assemble_oracle
    from genome_assembler_tpu.models.pipeline import assemble_tpu
    from genome_assembler_tpu.utils.config import AssemblyConfig
    from genome_assembler_tpu.utils.dna import decode_seq, key_words
    from genome_assembler_tpu.utils.simulate import (
        simulate_genome,
        simulate_reads,
    )

    assert key_words(63) == 4
    genome = simulate_genome(1500, seed=17)
    rs = simulate_reads(genome, coverage=15, read_len=100, seed=18)
    cfg = AssemblyConfig(k=63, read_len=100)
    contigs = assemble_tpu(rs.codes, cfg)
    assert contigs == assemble_oracle(rs.codes, cfg)
    assert contigs_equal(contigs, [decode_seq(genome)])
