"""The multimodal corpus workflow, end to end, on the test corpus —
every codec stdlib-real (no PIL/ffmpeg):

    documents
      → render 16x16 PNGs            (md5-defined pixels, zlib encode)
      → image dedup by aHash         (perceptual 64-bit fingerprint)
      → pixel stats on survivors     (decode: unfilter + zlib)
      → render Motion-PNG AVIs       (RIFF mux, 8 frames/doc)
      → sample every 2nd frame       (container demux — no codec)
      → per-frame features           (PNG decode per sampled frame)
      → render WAV PCM16             (stdlib wave RIFF)
      → audio features               (RMS / peak / zero crossings)

Each stage is a catalog operator with an arithmetic DuckDB oracle
(plans/image_queries.py). Run:

    python examples/multimodal_workflow.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hpv_etl_code_spark import get_spark  # noqa: E402
from hpv_etl_code_spark.operators.multimodal import (  # noqa: E402
    audio_sample_sums,
    image_ahash,
    image_pixel_sums,
    render_doc_png,
    render_doc_wav,
)
from hpv_etl_code_spark.operators.video import (  # noqa: E402
    frame_pixel_sums,
    render_doc_avi,
    sample_frames_avi,
)
from hpv_etl_code_spark.sources.registry import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="multimodal_workflow")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")

    # 1. render + perceptual dedup: keep one doc per aHash. The renders
    # are persisted — three downstream actions (dedup count, pixel
    # stats, the semi-join) would otherwise re-encode every PNG.
    # Permissive decode end to end: a corrupt payload drops its row
    # instead of failing the stage.
    pngs = render_doc_png(docs).persist()
    hashes = image_ahash(pngs, strict=False)
    keepers = hashes.groupBy("ahash").agg(F.min("doc_id").alias("doc_id"))
    survivors = pngs.join(keepers.select("doc_id"), "doc_id", "left_semi")
    n_in, n_kept = docs.count(), survivors.count()
    print(f"images: {n_in} rendered -> {n_kept} after aHash dedup")

    # 2. pixel features on survivors (permissive: corrupt blobs drop)
    stats = image_pixel_sums(survivors, strict=False)
    print("pixel stats sample:")
    stats.select(
        "doc_id",
        F.round(F.col("sum_px") / 256.0, 2).alias("mean_px"),
    ).orderBy("doc_id").show(5)
    pngs.unpersist()

    # 3. video: mux 8-frame AVIs, demux-sample every 2nd frame, featurize
    frames = sample_frames_avi(render_doc_avi(docs, n_frames=8), every_n=2)
    fstats = frame_pixel_sums(frames)
    print(f"video: {fstats.count()} sampled frames "
          f"({n_in} docs x 4 frames)")

    # 4. audio: WAV render + signal features
    audio = audio_sample_sums(render_doc_wav(docs))
    audio.select(
        "doc_id",
        F.round(F.sqrt(F.col("sumsq") / F.col("n_samples")), 1).alias("rms"),
        "peak",
        "zero_crossings",
    ).orderBy("doc_id").show(5)

    spark.stop()


if __name__ == "__main__":
    main()
