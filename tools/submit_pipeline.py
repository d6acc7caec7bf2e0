"""spark-submit entry point (north rule launch mode):

  sh tools/make_pyfiles.sh
  spark-submit --master <cluster> --py-files semlink.zip \
      tools/submit_pipeline.py --transcripts ... --anchors ... \
      --page-links ... --out ... [--labeled-pairs ...] [--fmt iceberg]

The engine rides in semlink.zip; this file is the thin driver script.
"""
from semlink.pipeline import main

if __name__ == "__main__":
    main()
