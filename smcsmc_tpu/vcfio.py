"""VCF -> .seg conversion (reference surface: smcsmc/utils.py:251-330
``vcf_to_seg`` + smcsmc/generate_smcsmcinput.py, itself derived from
msmc-tools' generate-multihetsep).

Fresh implementation: reads diploid genotypes for the requested samples from
(possibly gzipped) VCFs, applies optional positive bed masks of callable
regions, and emits consecutive .seg rows with the ``0/1/./'/'`` alphabet:
phased alleles as 0/1, unphased heterozygotes as ``//``, uncallable or
missing genotypes as ``..``.
"""

from __future__ import annotations

import gzip

import numpy as np

from .segio import SegData


def _open(path, mode="rt"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


class BedMask:
    """Positive mask: positions inside any interval are callable
    (generate_smcsmcinput.py:19-52 MaskIterator, loaded eagerly)."""

    def __init__(self, path: str | None):
        self.intervals: list[tuple[int, int]] = []
        if path is None:
            return
        with _open(path) as fh:
            for line in fh:
                f = line.strip().split()
                if not f or f[0].startswith("#"):
                    continue
                if len(f) == 2:
                    start, end = int(f[0]), int(f[1])
                else:
                    start, end = int(f[1]) + 1, int(f[2])  # bed is 0-based
                self.intervals.append((start, end))
        self.intervals.sort()

    def callable_in(self, lo: int, hi: int) -> int:
        """Number of callable positions in [lo, hi]."""
        if not self.intervals:
            return hi - lo + 1
        total = 0
        for s, e in self.intervals:
            if e < lo:
                continue
            if s > hi:
                break
            total += min(e, hi) - max(s, lo) + 1
        return total

    def contains(self, pos: int) -> bool:
        if not self.intervals:
            return True
        import bisect

        i = bisect.bisect_right(self.intervals, (pos, np.inf)) - 1
        return i >= 0 and self.intervals[i][0] <= pos <= self.intervals[i][1]


def read_vcf_genotypes(path: str, samples: list[str], chrom: str | None = None):
    """Yield (pos, [(a1, a2, phased), ...]) for requested samples."""
    with _open(path) as fh:
        sample_cols = None
        for line in fh:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                header = line.strip().split("\t")
                cols = {name: i for i, name in enumerate(header)}
                sample_cols = []
                for s in samples:
                    if s not in cols:
                        raise ValueError(f"sample {s!r} not in VCF {path}")
                    sample_cols.append(cols[s])
                continue
            f = line.rstrip("\n").split("\t")
            if chrom is not None and f[0] != str(chrom):
                continue
            if len(f[3]) != 1 or any(len(a) != 1 for a in f[4].split(",")):
                continue  # skip indels
            pos = int(f[1])
            fmt = f[8].split(":")
            gt_idx = fmt.index("GT") if "GT" in fmt else 0
            gts = []
            for ci in sample_cols:
                gt = f[ci].split(":")[gt_idx]
                phased = "|" in gt
                alleles = gt.replace("|", "/").split("/")
                if len(alleles) == 1:
                    alleles = alleles * 2  # haploid call
                a = []
                for al in alleles[:2]:
                    if al == "." or al == "":
                        a.append(-1)
                    else:
                        a.append(min(int(al), 1))
                gts.append((a[0], a[1], phased))
            yield pos, gts


def vcf_to_seg_data(
    vcf_samples: list[tuple[str, str]],
    chrom: str | None = None,
    masks: list[str] | None = None,
    sequence_length: int | None = None,
) -> SegData:
    """Convert [(vcf_path, sample_id), ...] to SegData.

    Column order follows the input list; each individual contributes two
    haplotypes.  Sites where a genotype is uncallable under its mask are
    encoded missing.
    """
    n_ind = len(vcf_samples)
    bed = [BedMask(masks[i]) if masks else BedMask(None) for i in range(n_ind)]

    # merge variant streams by position
    streams: dict[str, list] = {}
    for path, _sample in vcf_samples:
        if path not in streams:
            streams[path] = None
    per_file_samples: dict[str, list[str]] = {}
    for path, sample in vcf_samples:
        per_file_samples.setdefault(path, []).append(sample)
    site_map: dict[int, dict[str, tuple]] = {}
    for path, samps in per_file_samples.items():
        for pos, gts in read_vcf_genotypes(path, samps, chrom):
            row = site_map.setdefault(pos, {})
            for s, g in zip(samps, gts):
                row[s] = g

    positions = sorted(site_map)
    rows_pos, rows_len, rows_al = [], [], []
    last = 1
    for pos in positions:
        al = np.full(2 * n_ind, -1, dtype=np.int8)
        any_variant = False
        for i, (path, sample) in enumerate(vcf_samples):
            g = site_map[pos].get(sample)
            callable_here = bed[i].contains(pos)
            if g is None:
                # not a variant for this individual: hom-ref if callable
                if callable_here:
                    al[2 * i], al[2 * i + 1] = 0, 0
            else:
                a1, a2, phased = g
                if not callable_here or (a1 < 0 and a2 < 0):
                    pass  # stays missing
                elif a1 != a2 and not phased:
                    al[2 * i], al[2 * i + 1] = 2, 2
                    any_variant = True
                else:
                    al[2 * i], al[2 * i + 1] = a1, a2
                    any_variant = any_variant or a1 == 1 or a2 == 1
        if not any_variant:
            continue
        rows_pos.append(last)
        rows_len.append(pos - last + 1)
        rows_al.append(al)
        last = pos + 1
    if sequence_length and last <= sequence_length:
        rows_pos.append(last)
        rows_len.append(int(sequence_length) - last + 1)
        rows_al.append(np.full(2 * n_ind, -1, dtype=np.int8))
    if not rows_pos:
        raise ValueError("no usable variants found")
    alleles = np.array(rows_al, dtype=np.int8)
    return SegData(
        positions=np.array(rows_pos, dtype=np.int64),
        lengths=np.array(rows_len, dtype=np.int64),
        states=np.zeros(len(rows_pos), dtype=np.int8),
        alleles=alleles,
        phased=~np.any(alleles == 2, axis=0),
    )


def vcf_to_seg(
    input: list[tuple[str, str]],
    output: str,
    masks: list[str] | None = None,
    chroms=None,
    sequence_length: int | None = None,
) -> None:
    """File-level API mirroring smcsmc.vcf_to_seg (utils.py:251-330)."""
    from .segio import write_seg

    chrom = None
    if chroms is not None:
        chroms = list(chroms)
        chrom = chroms[0] if len(chroms) == 1 else None
    seg = vcf_to_seg_data(
        input, chrom=chrom, masks=masks, sequence_length=sequence_length
    )
    write_seg(output, seg)
