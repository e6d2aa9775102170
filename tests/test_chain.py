"""Chaining tests: colinear merging, strand separation, weights, filtering."""

import numpy as np
import pytest

from bwamem_tpu.config import MemOptions
from bwamem_tpu.index.build import build_index
from bwamem_tpu.pipeline.chain import (
    Chain,
    Seed,
    chain_read,
    chain_seeds,
    chain_weight,
    collect_seeds,
    filter_chains,
)

OPT = MemOptions()


def test_colinear_seeds_one_chain():
    seeds = [Seed(1000, 0, 25), Seed(1030, 30, 25), Seed(1061, 60, 30)]
    chains = chain_seeds(OPT, 10**6, seeds)
    assert len(chains) == 1
    assert len(chains[0].seeds) == 3


def test_distant_seeds_two_chains():
    seeds = [Seed(1000, 0, 25), Seed(500000, 30, 25)]
    chains = chain_seeds(OPT, 10**6, seeds)
    assert len(chains) == 2


def test_band_violation_new_chain():
    # diagonal offset beyond w=100 cannot chain
    seeds = [Seed(1000, 0, 25), Seed(1300, 30, 25)]
    chains = chain_seeds(OPT, 10**6, seeds)
    assert len(chains) == 2


def test_strand_boundary_not_crossed():
    l_pac = 2000
    seeds = [Seed(1990, 0, 25), Seed(2030, 40, 25)]  # crosses into revcomp
    chains = chain_seeds(OPT, l_pac, seeds)
    assert len(chains) == 2


def test_contained_seed_absorbed():
    seeds = [Seed(1000, 0, 50), Seed(1010, 10, 20)]
    chains = chain_seeds(OPT, 10**6, seeds)
    assert len(chains) == 1
    assert len(chains[0].seeds) == 1  # contained: not appended


def test_chain_weight_overlaps():
    c = Chain(seeds=[Seed(1000, 0, 30), Seed(1020, 20, 30)], pos=1000)
    # query coverage: [0,50) = 50; ref coverage: [1000,1050) = 50
    assert chain_weight(c) == 50


def test_filter_drop_weak_overlapping():
    big = Chain(seeds=[Seed(1000, 0, 80)], pos=1000)
    small = Chain(seeds=[Seed(9000, 85, 20)], pos=9000)  # non-overlapping
    tiny = Chain(seeds=[Seed(5000, 50, 10)], pos=5000)   # weak + overlapping
    kept = filter_chains(OPT, [big, small, tiny])
    spans = {(c.qbeg, c.qend) for c in kept}
    assert (0, 80) in spans
    assert (85, 105) in spans       # non-overlapping chains are never dropped
    assert (50, 60) not in spans    # weak overlapping chain is dropped


def test_filter_keeps_equal_weight_duplicates():
    """Two equal chains at duplicated loci both survive (-> MAPQ 0 later)."""
    a = Chain(seeds=[Seed(1000, 0, 60)], pos=1000)
    b = Chain(seeds=[Seed(50000, 0, 60)], pos=50000)
    kept = filter_chains(OPT, [a, b])
    assert len(kept) == 2
    assert kept[0].first_shadow == 1  # remembers the shadowed competitor


def test_end_to_end_chaining_on_index():
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, 30000).astype(np.uint8)
    fm = build_index(genome)
    # read with one SNP: both flanks should seed and land in ONE chain
    read = genome[12000:12100].astype(np.int64).copy()
    read[50] = (read[50] + 1) % 4
    chains = chain_read(fm, read, OPT)
    assert len(chains) == 1
    c = chains[0]
    assert c.rbeg == 12000 and c.qbeg == 0
    assert c.rend == 12100
    # reverse-strand read chains on the reverse coordinates
    rc = read[::-1].copy()
    rc[rc < 4] = 3 - rc[rc < 4]
    chains_rc = chain_read(fm, rc, OPT)
    assert len(chains_rc) == 1
    assert chains_rc[0].rbeg >= fm.l_pac


def test_repetitive_seed_subsampling():
    # a genome with a heavy repeat: seeds capped at max_occ
    unit = np.array([0, 1, 2, 3, 0, 0, 1, 3, 2, 1] * 3, dtype=np.uint8)
    genome = np.tile(unit, 700)  # 21 kb of repeat
    fm = build_index(genome)
    read = np.tile(unit, 2).astype(np.int64)  # 60 bp, massively repetitive
    opt = MemOptions(max_occ=50)
    seeds = collect_seeds(fm, read, opt)
    assert 0 < len(seeds) <= 50 * 4
