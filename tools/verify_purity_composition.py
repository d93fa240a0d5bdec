"""Compositional sf0.1 check: engine purity == rollup(engine knn, labels).
knn_graph_lsh itself is sf0.1 DuckDB-hash-verified, so this closes the
one oracle DuckDB can't evaluate at sf0.1 (its quadratic side OOMs at
100 GiB)."""
import sys
sys.path.insert(0, "/root/repo")
from go_triton_spark.session import get_spark
from go_triton_spark.operators import REGISTRY
import pandas as pd
spark = get_spark("purity-comp"); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
knn = REGISTRY["knn_graph_lsh"].spark(spark, sf).toPandas()
emb = spark.read.parquet(f"{sf}/embeddings.parquet").select("vec_id", "label").toPandas()
purity = REGISTRY["emb_label_knn_purity"].spark(spark, sf).toPandas()
j = (knn.merge(emb.rename(columns={"label": "q_label"}), on="vec_id")
        .merge(emb.rename(columns={"vec_id": "neighbor_id", "label": "n_label"}), on="neighbor_id"))
j["same"] = (j.q_label == j.n_label).astype(int)
ref = (j.groupby("q_label").agg(pairs=("same", "size"), same_label=("same", "sum")).reset_index()
        .rename(columns={"q_label": "label"}))
ref["purity"] = (ref.same_label / ref.pairs).round(6)
ref = ref.astype({"label": "int64", "pairs": "int64", "same_label": "int64"})
got = purity.sort_values("label").reset_index(drop=True)
ref = ref.sort_values("label").reset_index(drop=True)
print("engine rows:", len(got), "ref rows:", len(ref))
print("EQUAL" if got[["label","pairs","same_label","purity"]].equals(ref[["label","pairs","same_label","purity"]]) else "DIFFER")
print(got.head(3).to_string())
