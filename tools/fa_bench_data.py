"""Deterministic FA-shaped raw-input generator for the e2e pipeline
bench: synthesizes the four file families (Deed / Prop / TaxHist /
ValHist, fa-etl.py:20-483 input contract) as pipe-delimited .txt.zip
files across two counties (36061 and leading-zero 06037, arriving
4-digit as "6037"), sized proportionally to the scale factor.

Pure modular arithmetic, no RNG state: the same (sf, out_dir) always
produces byte-identical inputs, so bench timings are comparable across
rounds. Row mix deliberately exercises the cleaning filters (a slice
of null/zero SaleAmt, non-whitelisted TransactionType, zero lat/long,
short ZIP/tract needing lpad) at roughly the fixture ratios so the
pipeline does the same *kind* of work as on real extracts.
"""

from __future__ import annotations

import os
import zipfile

DEED_HEADER = (
    "PropertyID|SaleAmt|RecordingDate|FIPS|FATimeStamp|FATransactionID"
    "|TransactionType|SaleDate"
)
PROP_HEADER = (
    "PropertyID|PropertyClassID|FATimeStamp|SitusLatitude|SitusLongitude"
    "|SitusFullStreetAddress|SitusCity|SitusState|SitusZIP5|FIPS"
    "|SitusCensusTract|SitusCensusBlock|SitusGeoStatusCode"
)
TAXHIST_HEADER = "PropertyID|TaxYear|TaxAmt"
VALHIST_HEADER = (
    "PropertyID|AssdTotalValue|AssdYear|MarketTotalValue|MarketValueYear"
    "|ApprTotalValue|ApprYear|TaxableYear"
)

_COUNTIES = ("36061", "6037")  # second one tests leading-zero restore


def _date(pid: int, k: int) -> str:
    y = 2018 + (pid + k) % 4
    m = 1 + (pid * 7 + k) % 12
    d = 1 + (pid * 3 + k * 5) % 28
    return f"{y}{m:02d}{d:02d}"


def _deed_rows(pid: int) -> list[str]:
    rows = []
    for k in range(1 + pid % 3):  # 1-3 sales per property
        amt = 50_000 + (pid * 37 + k * 9_973) % 450_000
        if pid % 29 == 0 and k == 0:
            amt = 0  # zero SaleAmt → dropped by cleaning
        ttype = (2, 3, 2, 8)[(pid + k) % 4]  # '8' → non-whitelisted
        fid = f"{1 + (pid + k) % 9}X{pid % 97:02d}"
        fips = _COUNTIES[pid % 2]
        rows.append(
            f"{pid}|{amt}|{_date(pid, k)}|{fips}|{_date(pid, k + 1)}"
            f"|{fid}|{ttype}|{_date(pid, k)}"
        )
    return rows


def _prop_row(pid: int) -> str:
    fips = _COUNTIES[pid % 2]
    lat = 0 if pid % 23 == 0 else round(34.0 + (pid % 1000) / 1000.0, 4)
    lon = 0 if pid % 23 == 0 else round(-118.0 - (pid % 1000) / 1000.0, 4)
    zip5 = f"{2134 if pid % 17 == 0 else 90000 + pid % 9999}"  # some 4-digit
    tract = f"{pid % 999900}" if pid % 13 else "300"  # some needing lpad
    geo = "AB5Z"[pid % 4]  # 'Z' → nulled by whitelist
    cls = "R" if pid % 11 else "C"  # 'C' → dropped
    return (
        f"{pid}|{cls}|{_date(pid, 0)}|{lat}|{lon}|{pid} MAIN ST|CITY|CA"
        f"|{zip5}|{fips}|{tract}|{1000 + pid % 9000}|{geo}"
    )


def _taxhist_rows(pid: int) -> list[str]:
    return [
        f"{pid}|{2018 + (pid + k) % 4}|{100_000 + (pid * 13 + k * 777) % 2_000_000}"
        for k in range(1 + pid % 2)
    ]


def _valhist_rows(pid: int) -> list[str]:
    rows = []
    for k in range(1 + pid % 3):
        y = 2018 + (pid + k) % 4
        assd = 0 if pid % 31 == 0 and k == 0 else 200_000 + (pid * 17 + k * 3_301) % 800_000
        mkt = f"{assd + 10_000}|{y}" if (pid + k) % 3 else "|"
        appr = f"{assd + 20_000}|{y}" if (pid + k) % 5 == 0 else "|"
        rows.append(f"{pid}|{assd}|{y}|{mkt}|{appr}|{y}")
    return rows


_HEADERS = {
    "Deed": DEED_HEADER,
    "Prop": PROP_HEADER,
    "TaxHist": TAXHIST_HEADER,
    "ValHist": VALHIST_HEADER,
}

_ROW_FNS = {
    "Deed": _deed_rows,
    "Prop": lambda pid: [_prop_row(pid)],
    "TaxHist": _taxhist_rows,
    "ValHist": _valhist_rows,
}

_FLUSH_ROWS = 200_000  # ~15 MB of text per deflate chunk


def _write_family_zip(args: tuple[str, str, str, int]) -> None:
    """Stream one (family, county) member into its zip: rows are
    generated pid-by-pid and deflated in bounded chunks, so RSS stays
    constant no matter the scale (the r12 in-memory builder peaked at
    ~15 GB RSS for 20M props and could not reach 200M at all). Member
    CONTENT is byte-identical to the old header+join build — verified
    against the preserved 20M fixture when this landed."""
    raw_dir, fam, county, n_properties = args
    name = f"{fam}{county.zfill(5)}"
    path = os.path.join(raw_dir, f"{name}.txt.zip")
    row_fn = _ROW_FNS[fam]
    parity = _COUNTIES.index(county)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        # force_zip64: at 100M+ properties a member's uncompressed
        # text exceeds 4 GiB; the streaming writer can't know the
        # final size up front the way writestr could
        with zf.open(f"{name}.txt", "w", force_zip64=True) as out:
            buf: list[str] = [_HEADERS[fam]]
            for pid in range(1 + (parity == 0), n_properties + 1, 2):
                buf.extend(row_fn(pid))
                if len(buf) >= _FLUSH_ROWS:
                    out.write(("\n".join(buf) + "\n").encode())
                    buf = []
            if buf:
                out.write(("\n".join(buf) + "\n").encode())


def generate(input_dir: str, n_properties: int) -> str:
    """Write raw/ under ``input_dir`` with the four families split by
    county (8 zips), one streaming worker process per zip. Returns the
    input_dir for chaining.

    County parity: ``_COUNTIES[pid % 2]`` ⇒ county "6037" holds the
    odd pids (index 1), "36061" the even ones, so each worker walks
    ``range(parity_start, n, 2)`` and the union is exactly the old
    single loop — same rows in the same order per member.

    Workers are plain ``subprocess`` invocations of THIS FILE (see
    ``__main__`` below), not a multiprocessing pool: fork is unsafe
    from a process holding a live JVM (measure_baseline starts Spark
    before generating), and spawn deadlocks whenever the caller's
    ``__main__`` is not re-importable (a ``python - <<EOF`` harness, a
    REPL). A subprocess needs neither."""
    import subprocess
    import sys

    raw_dir = os.path.join(input_dir, "raw")
    os.makedirs(raw_dir, exist_ok=True)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             raw_dir, fam, county, str(n_properties)]
        )
        for fam in ("Deed", "Prop", "TaxHist", "ValHist")
        for county in _COUNTIES
    ]
    failed = [p.args for p in procs if p.wait() != 0]
    if failed:
        raise RuntimeError(f"generator workers failed: {failed}")
    return input_dir


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) == 6 and _sys.argv[1] == "--worker":
        _write_family_zip(
            (_sys.argv[2], _sys.argv[3], _sys.argv[4], int(_sys.argv[5]))
        )
    else:
        raise SystemExit(
            "usage: fa_bench_data.py --worker RAW_DIR FAMILY COUNTY N"
        )
