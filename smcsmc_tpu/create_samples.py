"""Split multi-sample VCFs into per-sample single-column VCFs.

Functional equivalent of the reference helper
(/root/reference/smcsmc/create_samples.py ``split_vcfs``): for each
(vcf, sample) pair and chromosome, write ``tmp{key}.{sample}.chr{c}.vcf.gz``
containing only that sample's column, with hom-ref and indel records
filtered out.  Idempotent: existing readable outputs are kept.
"""

from __future__ import annotations

import gzip
import logging
import os

logger = logging.getLogger("smcsmc_tpu")


def split_vcfs(
    input: list[tuple[str, str]],
    vcfdir: str,
    key: str,
    chroms=range(1, 23),
) -> list[str]:
    """Split samples into per-sample VCFs.

    :param input: list of ``(vcf_path_template, sample_name)`` pairs; the
        path template may contain ``{}`` for the chromosome number.
    :param vcfdir: directory for the split files (created if missing).
    :param key: filename prefix.
    :param chroms: chromosomes to process.
    :returns: paths of all (existing or newly written) split files.
    """
    out_paths = []
    for chrom in chroms:
        for vcf, sample in input:
            fname = os.path.join(
                vcfdir, f"tmp{key}.{sample}.chr{chrom}.vcf.gz"
            )
            out_paths.append(fname)
            try:
                with gzip.open(fname, "rb") as fh:
                    fh.read(1)
                logger.info("Found %s, not rewriting", fname)
                continue
            except (OSError, EOFError):
                pass
            os.makedirs(vcfdir, exist_ok=True)
            src = vcf.format(chrom)
            logger.info("Reading %s", src)
            opener = gzip.open if src.endswith(".gz") else open
            with opener(src, "rt") as fin, gzip.open(fname, "wt") as fout:
                col = None
                for line in fin:
                    if line.startswith("#CHROM"):
                        elts = line.rstrip("\n").split("\t")
                        hits = [i for i, e in enumerate(elts) if e == sample]
                        if not hits:
                            raise ValueError(
                                f"Could not find individual {sample}"
                            )
                        col = hits[0]
                        fout.write("\t".join(elts[:9] + [sample]) + "\n")
                    elif line.startswith("#"):
                        fout.write(line)
                    else:
                        if col is None:
                            raise ValueError(f"{src}: no #CHROM header")
                        elts = line.rstrip("\n").split("\t")
                        # drop hom-ref calls and indels
                        if (
                            not elts[col].startswith("0|0")
                            and len(elts[3]) == 1
                            and len(elts[4]) == 1
                        ):
                            fout.write(
                                "\t".join(elts[:9] + [elts[col]]) + "\n"
                            )
    return out_paths
