"""Re-shard FA raw .txt.zip inputs into N zips per (family, county).

Purpose (VERDICT r12 #5): the fazip executor-side DataSource
parallelizes per zip MEMBER, so its throughput against the
driver-extract path depends on member count, not data volume. The r12
20M measurement had only 8 members (4 families x 2 counties) — at most
8 concurrent Python data-source tasks against a 32-core
driver-extract + splittable-text path. A national FA run has thousands
of per-county zips; this tool synthesizes that shape from an existing
generated input_dir WITHOUT changing a byte of row data: each member's
data rows are split contiguously into N shard zips (each shard gets
its own header row — both ingest paths read per-file headers), so
`cat shards | grep -v header` == the original member.

Shard names keep the family marker (`Deed36061_s03.txt.zip`), so
`discover_families` (substring match) picks them up unchanged.

Usage:
    python tools/shard_zip_inputs.py SRC_RAW_DIR DST_RAW_DIR N_SHARDS
"""
from __future__ import annotations

import os
import subprocess
import sys
import zipfile

_CHUNK = 1 << 24  # 16 MiB decompressed per read


def shard_one_zip(src_zip: str, dst_dir: str, n_shards: int) -> None:
    """Stream one source zip's single member into n_shards zips,
    cutting only at line boundaries, constant RSS."""
    base = os.path.basename(src_zip)[: -len(".txt.zip")]
    with zipfile.ZipFile(src_zip) as zf:
        [info] = zf.infolist()
        budget = max(1, info.file_size // n_shards)
        with zf.open(info) as raw:
            header = b""
            while not header.endswith(b"\n"):
                b = raw.read(1)
                if not b:
                    raise ValueError(f"{src_zip}: no header line")
                header += b
            shard_idx = 0
            out_zf = out_fh = None
            written = 0

            def open_shard():
                nonlocal out_zf, out_fh, written
                name = f"{base}_s{shard_idx:03d}"
                out_zf = zipfile.ZipFile(
                    os.path.join(dst_dir, f"{name}.txt.zip"),
                    "w",
                    compression=zipfile.ZIP_DEFLATED,
                )
                out_fh = out_zf.open(f"{name}.txt", "w")
                out_fh.write(header)
                written = 0

            def close_shard():
                out_fh.close()
                out_zf.close()

            open_shard()
            pending = b""
            while True:
                chunk = raw.read(_CHUNK)
                if not chunk:
                    break
                data = pending + chunk
                # roll to the next shard only at a line boundary
                while written + len(data) > budget and shard_idx < n_shards - 1:
                    cut = data.rfind(b"\n", 0, budget - written) + 1
                    if cut <= 0:  # no newline inside the budget: take one line
                        cut = data.find(b"\n") + 1
                        if cut <= 0:
                            break  # partial line, need more input
                    out_fh.write(data[:cut])
                    close_shard()
                    shard_idx += 1
                    open_shard()
                    data = data[cut:]
                # keep a partial trailing line for the next read
                last_nl = data.rfind(b"\n") + 1
                out_fh.write(data[:last_nl])
                written += last_nl
                pending = data[last_nl:]
            if pending:
                # a source member not ending in \n keeps its partial
                # final line byte-identical — never append bytes
                out_fh.write(pending)
            close_shard()


def shard_raw_dir(src_raw: str, dst_raw: str, n_shards: int) -> None:
    """Shard every zip under src_raw, one worker process per source
    zip (same subprocess pattern as fa_bench_data.generate — safe
    under a live JVM and a non-importable __main__)."""
    os.makedirs(dst_raw, exist_ok=True)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             os.path.join(src_raw, f), dst_raw, str(n_shards)]
        )
        for f in sorted(os.listdir(src_raw))
        if f.endswith(".txt.zip")
    ]
    failed = [p.args for p in procs if p.wait() != 0]
    if failed:
        raise RuntimeError(f"shard workers failed: {failed}")


if __name__ == "__main__":
    if len(sys.argv) == 5 and sys.argv[1] == "--worker":
        shard_one_zip(sys.argv[2], sys.argv[3], int(sys.argv[4]))
    elif len(sys.argv) == 4:
        shard_raw_dir(sys.argv[1], sys.argv[2], int(sys.argv[3]))
    else:
        raise SystemExit(__doc__.splitlines()[-2].strip())
