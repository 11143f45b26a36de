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


def _write_zip(raw_dir: str, name: str, header: str, rows: list[str]) -> None:
    path = os.path.join(raw_dir, f"{name}.txt.zip")
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(f"{name}.txt", header + "\n" + "\n".join(rows) + "\n")


def generate(input_dir: str, n_properties: int) -> str:
    """Write raw/ under ``input_dir`` with the four families split by
    county (8 zips). Returns the input_dir for chaining."""
    raw_dir = os.path.join(input_dir, "raw")
    os.makedirs(raw_dir, exist_ok=True)
    fams: dict[tuple[str, str], list[str]] = {}
    for pid in range(1, n_properties + 1):
        county = _COUNTIES[pid % 2]
        fams.setdefault(("Deed", county), []).extend(_deed_rows(pid))
        fams.setdefault(("Prop", county), []).append(_prop_row(pid))
        fams.setdefault(("TaxHist", county), []).extend(_taxhist_rows(pid))
        fams.setdefault(("ValHist", county), []).extend(_valhist_rows(pid))
    headers = {
        "Deed": DEED_HEADER,
        "Prop": PROP_HEADER,
        "TaxHist": TAXHIST_HEADER,
        "ValHist": VALHIST_HEADER,
    }
    for (fam, county), rows in fams.items():
        _write_zip(raw_dir, f"{fam}{county.zfill(5)}", headers[fam], rows)
    return input_dir
