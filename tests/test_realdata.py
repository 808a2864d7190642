"""realdata manifest/CLI behavior (round-5 hardening, ADVICE r4 #4):
verify() must never silently bless a first download; recording is an
explicit opt-in and stays flagged UNVERIFIED; every unpinned MANIFEST
entry documents where its published checksum lives."""
import os

import pytest

from tpubwa.io import realdata as rd


def test_every_unpinned_entry_documents_md5_source():
    for key, files in rd.MANIFEST.items():
        for rf in files:
            assert rf.md5 is not None or rf.md5_source, \
                f"{key}/{rf.name} has neither a pinned md5 nor a " \
                f"documented md5_source"


def test_verify_does_not_record_without_flag(tmp_path, capsys):
    p = tmp_path / "U00096.3.fasta"
    p.write_text(">x\nACGT\n")
    ok = rd.verify(str(tmp_path), sets={"ecoli"})
    out = capsys.readouterr().out
    assert ok  # unverified is a warning, not a failure
    assert "UNVERIFIED" in out
    assert not os.path.exists(str(p) + ".md5.local")


def test_verify_record_writes_sidecar_then_pins(tmp_path, capsys):
    p = tmp_path / "U00096.3.fasta"
    p.write_text(">x\nACGT\n")
    assert rd.verify(str(tmp_path), sets={"ecoli"}, record=True)
    out = capsys.readouterr().out
    assert "RECORDED" in out and "UNVERIFIED" in out
    side = str(p) + ".md5.local"
    assert os.path.exists(side)
    # subsequent verify trusts the sidecar...
    assert rd.verify(str(tmp_path), sets={"ecoli"})
    assert "ok (local sidecar)" in capsys.readouterr().out
    # ...and a tampered file now FAILS
    p.write_text(">x\nACGA\n")
    assert not rd.verify(str(tmp_path), sets={"ecoli"})
    assert "MISMATCH" in capsys.readouterr().out


def test_cli_list_and_validate_args(capsys):
    assert rd.main(["list"]) == 0
    assert "md5_source" in capsys.readouterr().out
    # validate without a set is a usage error, not a crash
    assert rd.main(["validate"]) == 2


def test_validate_aborts_on_mismatch(tmp_path, capsys):
    p = tmp_path / "U00096.3.fasta"
    p.write_text(">x\nACGT\n")
    (tmp_path / "U00096.3.fasta.md5.local").write_text("0" * 32 + "\n")
    rc = rd.validate(str(tmp_path), "ecoli")
    assert rc == 1
    assert "aborted" in capsys.readouterr().out
