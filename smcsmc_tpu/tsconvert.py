"""Tree-sequence -> .seg conversion (reference: smcsmc/utils.py:13-143
``prune_tree_sequence`` / ``ts_to_seg``).

tskit is an optional dependency: when it is importable the full reference
API works on ``.trees`` files; without it, the numpy core
(:func:`variants_to_seg`) converts plain (positions, genotypes) arrays —
the exact data ``msprime``/``tskit`` users hold after ``ts.genotype_matrix()``
— so the conversion surface stays available in tskit-free environments.
"""

from __future__ import annotations

import os

import numpy as np


def _try_tskit():
    try:
        import tskit  # noqa: F401

        return tskit
    except ImportError:
        return None


def variants_to_seg(
    positions: np.ndarray,
    genotypes: np.ndarray,
    output: str,
    mask_intervals: np.ndarray | None = None,
) -> None:
    """Write variant arrays as a .seg file (utils.py:131-143 semantics:
    each row spans [prev, cur) and carries the genotype column at ``cur``).

    positions : [S] int — variant site positions (1-based or 0-based; rows
        start at the first position's left edge, matching the reference's
        ``prev = 1`` convention for position 1+).
    genotypes : [S, n] int — 0/1 per haplotype; negative = missing.
    mask_intervals : [K, 2] int, optional — [start, end) spans to emit as
        missing ('.') columns, the reference's bed-mask path.
    """
    positions = np.asarray(positions, dtype=np.int64)
    genotypes = np.asarray(genotypes)
    if genotypes.ndim != 2 or genotypes.shape[0] != positions.shape[0]:
        raise ValueError(
            "genotypes must be [num_sites, num_haplotypes] aligned with "
            f"positions; got {genotypes.shape} vs {positions.shape}"
        )

    def code(g):
        return "".join("." if int(x) < 0 else str(int(x)) for x in g)

    masks = (
        np.asarray(mask_intervals, dtype=np.int64).reshape(-1, 2)
        if mask_intervals is not None
        else np.empty((0, 2), np.int64)
    )
    mi = 0
    prev = 1
    with open(output, "w") as fh:
        for cur, g in zip(positions, genotypes):
            cur = int(cur)
            if cur <= prev:
                prev = max(prev, cur)
                continue
            # emit any mask intervals that start before this variant
            while mi < len(masks) and masks[mi, 0] < cur:
                m0, m1 = int(masks[mi, 0]), int(masks[mi, 1])
                if m0 > prev:
                    fh.write(f"{prev}\t{m0 - prev}\t{code(g)}\n")
                dots = "." * genotypes.shape[1]
                fh.write(f"{max(m0, prev)}\t{max(m1 - max(m0, prev), 0)}\t{dots}\n")
                prev = max(prev, m1)
                mi += 1
            if cur > prev:
                fh.write(f"{prev}\t{cur - prev}\t{code(g)}\n")
            prev = max(prev, cur)


def prune_tree_sequence(tree_sequence_path: str, num_samples: int):
    """Subsample a dumped tree sequence (utils.py:13-39); requires tskit."""
    tskit = _try_tskit()
    if tskit is None:
        raise ImportError(
            "prune_tree_sequence requires the optional tskit package; "
            "install tskit, or extract (positions, genotypes) yourself and "
            "use smcsmc_tpu.tsconvert.variants_to_seg"
        )
    ts = tskit.load(tree_sequence_path)
    if ts.num_samples > num_samples:
        subset = np.random.choice(ts.samples(), num_samples, replace=False)
        ts = ts.simplify(subset)
    return ts


def read_mask_bed(mask_file: str, chrom: str) -> np.ndarray:
    """[K, 2] mask intervals for one chromosome from a bed file."""
    spans = []
    import gzip

    op = gzip.open if mask_file.endswith(".gz") else open
    with op(mask_file, "rt") as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 3 and parts[0] == chrom:
                spans.append((int(parts[1]), int(parts[2])))
    return np.asarray(spans, dtype=np.int64).reshape(-1, 2)


def ts_to_seg(path: str, n, mask_file: str | None = None) -> list[str]:
    """Convert a dumped tree sequence to .seg files, one per sample size in
    ``n`` (reference utils.py:42-143; output naming parity:
    ``<dir>/<size>.<original>.seg``).  Returns the written paths."""
    if isinstance(n, int):
        n = [n]
    outputs = []
    for sample_size in n:
        ts = prune_tree_sequence(path, sample_size)
        dirr = os.path.dirname(path)
        filen = os.path.basename(path)
        sep = filen.split(".")
        chrom = sep[0]
        sep.insert(0, str(sample_size))
        output = os.path.join(dirr, ".".join(sep) + ".seg")
        positions = np.fromiter(
            (v.site.position for v in ts.variants()), dtype=np.int64
        )
        genotypes = ts.genotype_matrix()
        masks = read_mask_bed(mask_file, chrom) if mask_file else None
        variants_to_seg(positions, genotypes, output, mask_intervals=masks)
        outputs.append(output)
    return outputs
