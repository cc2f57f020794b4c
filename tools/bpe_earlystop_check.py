#!/usr/bin/env python3
"""End-to-end early-stop parity check for the BPE train/encode pair.

Builds a fixture sf-dir whose documents table exhausts mergeable pairs
after ONE round (tokens: ab ab cd -> merge (a,b) cnt 2; then every
remaining pair has cnt 1, below BpeTrainer.MinPairFrequency), while the
queries train with K=6 - so BOTH engines must take the early-stop path:
the trainer's `case None => done`, the oracle's empty-t_i LEFT JOIN
pass-through. A cross-join oracle (the pre-round-10 form) empties v_i
and every CTE after it and fails this check.

Usage: python3 tools/bpe_earlystop_check.py
(expects a compiled repo; runs sbt Verify on the fixture, then the
verify_local gate). Exit 0 iff both queries compare green.
"""
import os
import shutil
import subprocess
import sys

SRC = "/root/testdata/sf0.001"
FIX = "/tmp/graft_bpestop"
OUT = "/tmp/graft_bpestop_out"

import pyarrow as pa
import pyarrow.parquet as pq

def main():
    shutil.rmtree(FIX, ignore_errors=True)
    shutil.rmtree(OUT, ignore_errors=True)
    shutil.copytree(SRC, FIX)
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["ab ab cd", "ab cd", "cd"]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["web"] * 3),
        "n_chars": pa.array([8, 5, 2], pa.int64()),
    })
    pq.write_table(docs, os.path.join(FIX, "documents.parquet"))

    env = dict(os.environ,
               SPARK_GRAFT_VERIFY_ONLY="q_bpe_merges,q_bpe_encode",
               SPARK_GRAFT_CPUS="8")
    subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {FIX} {OUT}"],
        cwd="/root/repo", env=env, check=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    rc = subprocess.run(
        [sys.executable, "tools/verify_local.py", FIX, OUT],
        cwd="/root/repo").returncode
    sys.exit(rc)

if __name__ == "__main__":
    main()
