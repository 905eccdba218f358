"""Train the learned-decode weight tables: run the Spark MLE aggregation
job over the committed synthetic treebank and write
stanza_spark/resources/learned_weights.json (plus the raw count tables as
parquet for inspection).

Usage: python tools/train_learned.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from stanza_spark.operators.learned_train import (treebank_df,
                                                      write_weights)
    from stanza_spark.session import get_spark

    spark = get_spark("train-learned", cores=4, shuffle_partitions=4)
    out = write_weights(spark)
    # raw treebank + per-pair counts as parquet, the inspectable artifact
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pq = os.path.join(repo, "spark-warehouse", "learned_counts")
    df = treebank_df(spark)
    df.write.mode("overwrite").parquet(os.path.join(pq, "treebank"))
    nxt = df.selectExpr("sent_id", "pos - 1 AS pos", "tag AS next_tag")
    (df.join(nxt, ["sent_id", "pos"]).groupBy("tag", "next_tag").count()
     .write.mode("overwrite").parquet(os.path.join(pq, "trans_counts")))
    print(f"wrote {len(out['weights']['emit'])} emission rows, "
          f"{len(out['counts']['trans'])} transition pairs -> "
          f"resources/learned_weights.json + {pq}")


if __name__ == "__main__":
    main()
