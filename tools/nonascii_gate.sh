#!/bin/sh
# Non-ASCII oracle gate (r8): prove the byte-folding oracles (PolyHash /
# MinHash / SimHash / md5 / byte-entropy) hash-match DuckDB on text where
# char != byte. Three steps: fixture -> Verify (restricted) -> check.py.
# Run from /root/repo after `sbt package` (or with a compiled target/).
set -e
CP="target/scala-2.13/classes:/opt/spark/jars/*"
FIX=target/nonascii/sf
OUT=target/nonascii/out
java -cp "$CP" graft.tools.NonAsciiFixture /root/testdata/sf0.001 "$FIX"
# Gate set mirrors NonAsciiFixture.ByteSensitive.
SPARK_GRAFT_ONLY="q32_fingerprints,q33_exact_dedup,q34_minhash_signatures,q36_minhash_lsh_pairs,q37_simhash,q48_minhash_lsh_oracle,q55_simhash_oracle,q56_winnowing,q67_corpus_overlap_fast,q86_heavy_hitters,q87_simhash_neardup,q88_kmv_distinct,q90_char_entropy" \
  java -cp "$CP" graft.Verify "$FIX" "$OUT"
python3 tools/check.py "$FIX" "$OUT"
