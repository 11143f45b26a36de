"""Byte-parity pin for the FA bench-data generator.

The generator's docstring claims the streamed/parallel writer is
byte-identical to the retired in-memory builder, but until now that was
only manually verified against the preserved 20M fixture (r13 ADVICE).
These digests freeze the member content at 1k properties: any future
chunking, parity-split, or row-function regression changes a digest and
fails here loudly instead of silently invalidating cross-round bench
comparability.

No Spark needed — pure zipfile + hashlib.
"""

import hashlib
import os
import zipfile

import pytest

from tools import fa_bench_data

# sha256 of each member's UNCOMPRESSED text at n_properties=1000,
# computed from the generator as of r14. The generator is pure modular
# arithmetic (no RNG), so these are stable by construction; a change
# here is a deliberate format change and must be called out in the
# commit message (it resets bench comparability).
MEMBER_SHA256 = {
    "Deed06037.txt.zip": "6d04809914309ee4421535658bd29087b9eb5ef6b827a700c868fc9f1f01df55",
    "Deed36061.txt.zip": "528c2251f89b02a299e0f1832c940929cf22bba0cc7b31db3ba571d4746d786d",
    "Prop06037.txt.zip": "6ef219059926086aca11d1954a39923faf11b604ff18e7af2d3782ac4ac4a3d8",
    "Prop36061.txt.zip": "5eaa43ad0ea88bd14899aade1848082241eb7e653cfce651b0c66153b0f910c2",
    "TaxHist06037.txt.zip": "6f9c30b8e033afec0974bd1fb4f0a131be2444941316af206fa7ba949ee80a47",
    "TaxHist36061.txt.zip": "2e24c182229468006d60a83fc1fbdd987fd54f47e5e2e92ed5ba78fee02fea20",
    "ValHist06037.txt.zip": "3ad7153c20fd906a5c68d720395a51dc4f2ff88571271ff3c9b022b1d3dfdfe4",
    "ValHist36061.txt.zip": "7d9bfac6fe1838e7455772ca83bfcfece8c103f9444ebeac77ce3230f0149a8e",
}


def _member_digest(zip_path):
    with zipfile.ZipFile(zip_path) as zf:
        names = zf.namelist()
        assert len(names) == 1, f"{zip_path} should hold exactly one member"
        return hashlib.sha256(zf.read(names[0])).hexdigest()


def test_generated_members_match_committed_digests(tmp_path):
    """Full generate() path (one subprocess per zip) at 1k props."""
    fa_bench_data.generate(str(tmp_path), 1000)
    raw = tmp_path / "raw"
    produced = sorted(os.listdir(raw))
    assert produced == sorted(MEMBER_SHA256), (
        f"member set changed: {produced}"
    )
    for name, want in MEMBER_SHA256.items():
        got = _member_digest(raw / name)
        assert got == want, f"{name} content drifted: {got} != {want}"


@pytest.mark.parametrize("flush_rows", [1, 7, 100])
def test_chunked_flush_is_byte_identical(tmp_path, monkeypatch, flush_rows):
    """The deflate-chunk boundary must never alter member bytes: the
    1k-prop run above flushes exactly once (_FLUSH_ROWS=200k), so this
    re-writes one member in-process with tiny flush sizes and checks it
    still hashes to the committed digest — the chunking-regression
    case the r13 ADVICE called out."""
    monkeypatch.setattr(fa_bench_data, "_FLUSH_ROWS", flush_rows)
    fa_bench_data._write_family_zip((str(tmp_path), "Deed", "6037", 1000))
    got = _member_digest(tmp_path / "Deed06037.txt.zip")
    assert got == MEMBER_SHA256["Deed06037.txt.zip"]
