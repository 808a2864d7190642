"""Real-data manifest + loader (VERDICT round-3 Missing #4).

Every corpus in this repo is synthetic (tpubwa/sim.py): this
environment has zero network egress, so real GRCh38 / Illumina read
sets cannot be fetched.  The round-2->3 lesson was that corpus realism
moved the headline by ~7x; this module makes the real-data run a
single command the moment a networked machine exists, with checksums
pinned NOW so the inputs are reproducible.

The manifest mirrors the validation sets BASELINE.json names (E. coli
+ GRCh38; SURVEY.md §4 item 1) using standard public accessions:

- GRCh38 no-alt analysis set: the reference everyone benchmarks
  bwa-mem against (GCA_000001405.15, no_alt_plus_hs38d1 variant
  excluded deliberately: stock bwa-mem scores ALT contigs only with
  the .alt file present, and SAM equality is cleanest no-alt).
- E. coli K-12 MG1655 (U00096.3).
- Illumina reads: Genome in a Bottle HG002 2x250bp run and the
  1000 Genomes phase-3 exemplar ERR194147 (2x101bp, the set most bwa
  papers quote).

Checksum policy (VERDICT r4 Missing #4 + ADVICE r4): this zero-egress
environment cannot read the hosting archives' manifests, and pinning
an md5 from memory risks blocking a legitimate fetch with a wrong
pin, so every MANIFEST entry carries either a pinned md5 or a
`md5_source` documenting exactly where the published value lives
(NCBI `md5checksums.txt`, the GIAB run manifest, the ENA filereport
API).  Recording a local sidecar is now EXPLICIT: `verify --record`
writes `<name>.md5.local` and loudly marks it UNVERIFIED until a
human cross-checks it against the documented source; a plain fetch or
verify never silently blesses a first download (ADVICE r4: fetch()
used to chain into an auto-recording verify()).

Usage (networked machine):
    python -m tpubwa.io.realdata fetch --set ecoli --dest data/
    python -m tpubwa.io.realdata verify --record --dest data/
    # cross-check printed md5s against each entry's md5_source, then:
    python -m tpubwa.io.realdata validate --set ecoli --dest data/
(`validate` = verify, then exec scripts/diff_vs_bwa.sh on the set's
reference + reads — the one-command SAM-equality path.)
"""

from __future__ import annotations

import hashlib
import os
import sys
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class RemoteFile:
    name: str                 # local file name under dest/
    url: str                  # canonical public URL
    md5: Optional[str]        # pinned md5; None REQUIRES md5_source
    size_hint: str            # human-readable, for download planning
    md5_source: str = ""      # where the published md5 lives (the
    #                           documented reason the pin is absent:
    #                           zero-egress build env cannot read it)


MANIFEST = {
    "grch38": [
        RemoteFile(
            "GCA_000001405.15_GRCh38_no_alt_analysis_set.fna.gz",
            "https://ftp.ncbi.nlm.nih.gov/genomes/all/GCA/000/001/405/"
            "GCA_000001405.15_GRCh38/seqs_for_alignment_pipelines."
            "ucsc_ids/GCA_000001405.15_GRCh38_no_alt_analysis_set.fna.gz",
            None, "~900 MB",
            "md5checksums.txt in the same NCBI directory "
            "(seqs_for_alignment_pipelines.ucsc_ids/)"),
    ],
    "ecoli": [
        RemoteFile(
            "U00096.3.fasta",
            "https://eutils.ncbi.nlm.nih.gov/entrez/eutils/efetch.fcgi"
            "?db=nuccore&id=U00096.3&rettype=fasta&retmode=text",
            None, "~4.6 MB",
            "no published md5 (efetch renders FASTA on the fly); "
            "cross-check sequence length 4,641,652 bp + header "
            "U00096.3 instead"),
    ],
    "reads_hg002": [
        RemoteFile(
            "D1_S1_L001_R1_001.fastq.gz",
            "https://ftp-trace.ncbi.nlm.nih.gov/ReferenceSamples/giab/"
            "data/AshkenazimTrio/HG002_NA24385_son/NIST_Illumina_2x250bps/"
            "reads/D1_S1_L001_R1_001.fastq.gz",
            None, "~2 GB",
            "GIAB run checksum list: same tree, "
            "NIST_Illumina_2x250bps/checksums or the alignment.README"),
        RemoteFile(
            "D1_S1_L001_R2_001.fastq.gz",
            "https://ftp-trace.ncbi.nlm.nih.gov/ReferenceSamples/giab/"
            "data/AshkenazimTrio/HG002_NA24385_son/NIST_Illumina_2x250bps/"
            "reads/D1_S1_L001_R2_001.fastq.gz", None, "~2 GB",
            "GIAB run checksum list: same tree, "
            "NIST_Illumina_2x250bps/checksums or the alignment.README"),
    ],
    "reads_err194147": [
        RemoteFile(
            "ERR194147_1.fastq.gz",
            "https://ftp.sra.ebi.ac.uk/vol1/fastq/ERR194/ERR194147/"
            "ERR194147_1.fastq.gz", None, "~48 GB",
            "ENA filereport API: https://www.ebi.ac.uk/ena/portal/api/"
            "filereport?accession=ERR194147&result=read_run&"
            "fields=fastq_md5"),
        RemoteFile(
            "ERR194147_2.fastq.gz",
            "https://ftp.sra.ebi.ac.uk/vol1/fastq/ERR194/ERR194147/"
            "ERR194147_2.fastq.gz", None, "~50 GB",
            "ENA filereport API: https://www.ebi.ac.uk/ena/portal/api/"
            "filereport?accession=ERR194147&result=read_run&"
            "fields=fastq_md5"),
    ],
}


def _md5(path: str, chunk: int = 1 << 22) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def verify(dest: str, sets=None, record: bool = False) -> bool:
    """Checksum every present manifest file; missing files are
    reported but do not fail (partial mirrors are fine), mismatches
    fail.  Files with neither a pinned md5 nor a sidecar are reported
    UNVERIFIED — pass record=True (CLI --record) to write the sidecar,
    which stays flagged as unverified provenance until a human
    cross-checks it against the entry's md5_source (ADVICE r4: never
    auto-record with no one in the loop)."""
    ok = True
    unverified = []
    for key, files in MANIFEST.items():
        if sets and key not in sets:
            continue
        for rf in files:
            path = os.path.join(dest, rf.name)
            if not os.path.exists(path):
                print(f"[realdata] missing  {key}/{rf.name}")
                continue
            got = _md5(path)
            want = rf.md5
            side = path + ".md5.local"
            pinned = want is not None
            if want is None and os.path.exists(side):
                want = open(side).read().strip()
            if want is None:
                if record:
                    with open(side, "w") as f:
                        f.write(got + "\n")
                    print(f"[realdata] RECORDED {key}/{rf.name} "
                          f"md5={got}")
                else:
                    print(f"[realdata] UNVERIFIED {key}/{rf.name} "
                          f"md5={got} (no pin; re-run with --record "
                          f"to write the sidecar)")
                unverified.append((key, rf, got))
            elif got != want:
                print(f"[realdata] MISMATCH {key}/{rf.name}: "
                      f"got {got} want {want}")
                ok = False
            else:
                tag = "ok      " if pinned else "ok (local sidecar)"
                print(f"[realdata] {tag} {key}/{rf.name}")
    for key, rf, got in unverified:
        print(f"[realdata] WARNING: {rf.name} md5 {got} is UNVERIFIED"
              f" — cross-check against: {rf.md5_source}")
    return ok


def fetch(dest: str, sets=None) -> bool:
    """Download manifest files with any available fetcher (curl/wget/
    urllib); no-op for files already present.  Never records
    checksums itself — it chains into a non-recording verify() so a
    tampered first download cannot silently become ground truth."""
    import shutil
    import subprocess
    import urllib.request
    os.makedirs(dest, exist_ok=True)
    ok = True
    for key, files in MANIFEST.items():
        if sets and key not in sets:
            continue
        for rf in files:
            path = os.path.join(dest, rf.name)
            if os.path.exists(path):
                print(f"[realdata] have     {key}/{rf.name}")
                continue
            print(f"[realdata] fetching {rf.url} ({rf.size_hint})")
            tmp = path + ".part"
            try:
                if shutil.which("curl"):
                    subprocess.run(["curl", "-L", "--fail", "-o", tmp,
                                    rf.url], check=True)
                else:
                    urllib.request.urlretrieve(rf.url, tmp)
                os.replace(tmp, path)
            except Exception as e:  # noqa: BLE001 - report and continue
                print(f"[realdata] FAILED   {key}/{rf.name}: {e}")
                ok = False
    return ok and verify(dest, sets, record=False)


# per-set (reference fasta, [reads...]) for the one-command
# verify-then-diff path; reads sets name which reference they map to
VALIDATE_SETS = {
    "ecoli": ("ecoli", ["U00096.3.fasta"], []),
    "grch38": ("grch38",
               ["GCA_000001405.15_GRCh38_no_alt_analysis_set.fna.gz"],
               []),
    "hg002": ("grch38",
              ["GCA_000001405.15_GRCh38_no_alt_analysis_set.fna.gz"],
              ["D1_S1_L001_R1_001.fastq.gz",
               "D1_S1_L001_R2_001.fastq.gz"]),
    "err194147": ("grch38",
                  ["GCA_000001405.15_GRCh38_no_alt_analysis_set"
                   ".fna.gz"],
                  ["ERR194147_1.fastq.gz", "ERR194147_2.fastq.gz"]),
}


def validate(dest: str, setname: str) -> int:
    """verify (no recording) then exec scripts/diff_vs_bwa.sh on the
    set's reference + reads: the one-command SAM-equality path
    (VERDICT r4 Missing #3/#4)."""
    import subprocess
    refset, refs, reads = VALIDATE_SETS[setname]
    if not verify(dest, sets={refset,
                              "reads_" + setname} if reads else
                  {refset}):
        print("[realdata] validate aborted: checksum verification "
              "failed")
        return 1
    ref = os.path.join(dest, refs[0])
    argv = [os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "scripts",
        "diff_vs_bwa.sh"), ref] + [os.path.join(dest, r)
                                   for r in reads]
    print("[realdata] exec:", " ".join(argv))
    return subprocess.call(argv)


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(prog="tpubwa.io.realdata")
    ap.add_argument("cmd", choices=["fetch", "verify", "list",
                                    "validate"])
    ap.add_argument("--dest", default="data")
    ap.add_argument("--set", action="append", dest="sets",
                    choices=sorted(set(MANIFEST) | set(VALIDATE_SETS)))
    ap.add_argument("--record", action="store_true",
                    help="verify: write .md5.local sidecars for "
                    "unpinned files (flagged UNVERIFIED until "
                    "cross-checked against each entry's md5_source)")
    a = ap.parse_args(argv)
    if a.cmd == "list":
        for key, files in MANIFEST.items():
            for rf in files:
                print(f"{key:16s} {rf.name:50s} {rf.size_hint:8s} "
                      f"md5={rf.md5 or '(see md5_source)'}")
                if rf.md5 is None:
                    print(f"{'':16s}   md5_source: {rf.md5_source}")
        return 0
    if a.cmd == "validate":
        if not a.sets or len(a.sets) != 1 or \
                a.sets[0] not in VALIDATE_SETS:
            print("validate needs exactly one --set of: "
                  + ", ".join(sorted(VALIDATE_SETS)))
            return 2
        return validate(a.dest, a.sets[0])
    if a.cmd == "fetch":
        return 0 if fetch(a.dest, a.sets) else 1
    return 0 if verify(a.dest, a.sets, record=a.record) else 1


if __name__ == "__main__":
    sys.exit(main())
