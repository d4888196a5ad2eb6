"""Staged distributed index building (reference lance.indices.IndicesBuilder,
python/python/lance/indices/builder.py): train → assign/transform → shuffle →
load must commit an index equivalent to the monolithic create_index path —
same manifest registration, same search behavior through ds.nearest."""

import numpy as np
import pytest

from lance_spark.indices import IndicesBuilder, IvfModel, PqModel


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture()
def ds(spark, emb, tmp_path):
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "ds")
    write_dataset(emb.repartition(4), uri, mode="create")
    return dataset(uri)


def _query_vec(emb, vec_id):
    row = emb.where(f"vec_id = {vec_id}").first()
    return [float(x) for x in row["embedding"]]


def test_models_save_load_roundtrip(tmp_path):
    ivf = IvfModel(np.random.default_rng(0).standard_normal((8, 16)), "cosine")
    ivf.save(str(tmp_path / "ivf"))
    back = IvfModel.load(str(tmp_path / "ivf"))
    assert back.distance_type == "cosine" and back.num_partitions == 8
    np.testing.assert_allclose(back.centroids, ivf.centroids, rtol=1e-6)

    pq = PqModel(4, np.random.default_rng(1).standard_normal((4, 256, 4)))
    pq.save(str(tmp_path / "pq"))
    back = PqModel.load(str(tmp_path / "pq"))
    assert back.num_subvectors == 4 and back.dimension == 16
    np.testing.assert_allclose(back.codebook, pq.codebook, rtol=1e-6)


def test_staged_build_end_to_end(spark, ds, emb, tmp_path):
    b = IndicesBuilder(ds, "embedding", spark)
    ivf = b.train_ivf(8, distance_type="l2", sample_rate=64)
    assert ivf.num_partitions == 8
    pq = b.train_pq(ivf, num_subvectors=8, sample_rate=16)
    assert pq.dimension == ivf.centroids.shape[1]

    work = str(tmp_path / "work")
    unsorted = b.transform_vectors(ivf, pq, work + "/unsorted")
    files = b.shuffle_transformed_vectors(["unsorted"], work, ivf)
    assert files and all(f.startswith("sorted") for f in files)
    ds2 = b.load_shuffled_vectors(files, work, ivf, pq, index_name="emb_idx")

    metas = ds2.list_indices()
    assert metas and metas[0]["name"] == "emb_idx"
    assert metas[0]["index_type"] == "IVF_PQ"

    # staged index answers nearest like the monolithic one: exact row first
    q = _query_vec(emb, 7)
    res = ds2.nearest(
        spark, "embedding", q, k=5, nprobes=8, refine_factor=8
    ).collect()
    assert res[0]["vec_id"] == 7
    assert res[0]["_distance"] == pytest.approx(0.0, abs=1e-5)


def test_rebuild_never_clobbers_live_index(spark, ds, emb, tmp_path):
    """r13 review: load_shuffled_vectors used to rmtree the LIVE committed
    index dir before running the radii job — a failure mid-build left the
    manifest pointing at a deleted path. Now it stages + swaps: a rebuild
    whose radii job fails leaves the committed index fully readable."""
    import os

    import numpy as np

    from lance_spark.indexes import builder as builder_mod

    b = IndicesBuilder(ds, "embedding", spark)
    ivf = b.train_ivf(4, distance_type="l2", sample_rate=32)
    work = str(tmp_path / "w1")
    b.transform_vectors(ivf, None, work + "/unsorted")
    files = b.shuffle_transformed_vectors(["unsorted"], work, ivf)
    ds2 = b.load_shuffled_vectors(files, work, ivf, None, index_name="live_idx")
    q = _query_vec(emb, 3)
    assert ds2.nearest(spark, "embedding", q, k=3, nprobes=4).count() == 3

    # second build whose radii computation explodes mid-flight
    work2 = str(tmp_path / "w2")
    b2 = IndicesBuilder(ds2, "embedding", spark)
    b2.transform_vectors(ivf, None, work2 + "/unsorted")
    files2 = b2.shuffle_transformed_vectors(["unsorted"], work2, ivf)
    real = builder_mod.compute_partition_radii

    def boom(*a, **k):
        raise RuntimeError("injected radii failure")

    builder_mod.compute_partition_radii = boom
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="injected"):
            b2.load_shuffled_vectors(files2, work2, ivf, None, index_name="live_idx")
    finally:
        builder_mod.compute_partition_radii = real
    # the COMMITTED index still opens and answers
    from lance_spark.dataset import LanceDataset

    ds3 = LanceDataset(ds2.uri)
    assert ds3.nearest(spark, "embedding", q, k=3, nprobes=4).count() == 3
    live = os.path.join(ds2.uri, "_indices", "live_idx")
    assert os.path.isfile(os.path.join(live, "meta.json"))
    assert np.load(os.path.join(live, "radii.npy")).shape[0] == 4


def test_precomputed_partition_assignment(spark, ds, tmp_path):
    b = IndicesBuilder(ds, "embedding", spark)
    ivf = b.train_ivf(4, distance_type="l2", sample_rate=64)
    pq = b.train_pq(ivf, num_subvectors=4, sample_rate=16)

    parts_uri = b.assign_ivf_partitions(ivf, output_uri=str(tmp_path / "parts"))
    direct = b.transform_vectors(ivf, pq, str(tmp_path / "direct"))
    via_pre = b.transform_vectors(
        ivf, pq, str(tmp_path / "via_pre"), partition_ds_uri=parts_uri
    )
    a = {
        r["id"]: (r["partition_id"], tuple(r["pq_code"]))
        for r in spark.read.parquet(direct).collect()
    }
    c = {
        r["id"]: (r["partition_id"], tuple(r["pq_code"]))
        for r in spark.read.parquet(via_pre).collect()
    }
    assert a == c


def test_train_ivf_defaults_and_errors(spark, ds):
    b = IndicesBuilder(ds, "embedding", spark)
    with pytest.raises(ValueError):
        b.train_ivf(4, distance_type="manhattan")
    with pytest.raises(ValueError):
        b.shuffle_transformed_vectors("not-a-list", "/tmp", None)
    # default num_partitions ≈ sqrt(n)
    n = ds.count_rows()
    ivf = b.train_ivf(sample_rate=2)
    assert ivf.num_partitions == max(1, int(round(np.sqrt(n))))


def test_subset_transform_marks_partial_coverage(spark, ds, emb, tmp_path):
    """Transforming only SOME fragments must commit partial coverage so the
    untransformed fragments stay reachable via the flat-search tail."""
    b = IndicesBuilder(ds, "embedding", spark)
    ivf = b.train_ivf(4, distance_type="l2", sample_rate=64)
    all_fids = [f.id for f in ds.manifest.fragments]
    subset = all_fids[:2]

    work = str(tmp_path / "w")
    b.transform_vectors(ivf, None, work + "/unsorted", fragments=subset)
    files = b.shuffle_transformed_vectors(["unsorted"], work, ivf)
    ds2 = b.load_shuffled_vectors(files, work, ivf, None, index_name="part_idx")

    meta = next(i for i in ds2.manifest.indices if i.name == "part_idx")
    assert sorted(meta.fragment_ids) == sorted(subset)

    # a row living in an UNtransformed fragment is still found (flat tail)
    tail_fid = all_fids[2]
    row = ds2.scanner(spark, fragments=[tail_fid]).first()
    q = [float(x) for x in row["embedding"]]
    res = ds2.nearest(spark, "embedding", q, k=3, nprobes=4).collect()
    assert res[0]["vec_id"] == row["vec_id"]
    assert res[0]["_distance"] == pytest.approx(0.0, abs=1e-5)


def test_precomputed_assignment_left_join_keeps_new_rows(spark, emb, tmp_path):
    """Rows appended AFTER assign_ivf_partitions keep their freshly-computed
    partition instead of being dropped by the precompute join."""
    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "ds")
    write_dataset(emb.limit(100).repartition(2), uri, mode="create")
    ds = dataset(uri)
    b = IndicesBuilder(ds, "embedding", spark)
    ivf = b.train_ivf(4, distance_type="l2", sample_rate=16)
    parts = b.assign_ivf_partitions(ivf, output_uri=str(tmp_path / "parts"))

    # append more rows, re-open, transform with the stale precompute
    ds.insert(emb.limit(150))
    ds2 = dataset(uri)
    b2 = IndicesBuilder(ds2, "embedding", spark)
    out = b2.transform_vectors(ivf, None, str(tmp_path / "t"), partition_ds_uri=parts)
    n = spark.read.parquet(out).count()
    assert n == ds2.count_rows()  # nothing silently dropped


def test_multi_chunk_transform_coverage_union(spark, ds, emb, tmp_path):
    """Two transform chunks shuffled into SEPARATE output dirs: the
    committed IndexMeta must union coverage across every source dir's
    _coverage.json, not stop at the first — otherwise the second chunk's
    fragments live in the codes AND on the flat-search tail (duplicate
    candidates)."""
    b = IndicesBuilder(ds, "embedding", spark)
    ivf = b.train_ivf(4, distance_type="l2", sample_rate=64)
    fids = [f.id for f in ds.manifest.fragments]
    assert len(fids) >= 2
    work = str(tmp_path / "w")
    b.transform_vectors(ivf, None, work + "/u0", fragments=fids[:1])
    b.transform_vectors(ivf, None, work + "/u1", fragments=fids[1:])
    f0 = b.shuffle_transformed_vectors(["u0"], work, ivf, shuffle_output_root_filename="s0")
    f1 = b.shuffle_transformed_vectors(["u1"], work, ivf, shuffle_output_root_filename="s1")
    ds2 = b.load_shuffled_vectors(f0 + f1, work, ivf, None, index_name="union_idx")
    meta = next(i for i in ds2.manifest.indices if i.name == "union_idx")
    assert sorted(meta.fragment_ids) == sorted(fids)
    # no duplicate candidates: exact self-match returns exactly one row per vec
    row = ds2.scanner(spark, fragments=[fids[-1]]).first()
    q = [float(x) for x in row["embedding"]]
    res = ds2.nearest(spark, "embedding", q, k=3, nprobes=4).collect()
    assert res[0]["vec_id"] == row["vec_id"]
    assert len({r["vec_id"] for r in res}) == len(res)


def test_stale_precompute_reencodes_pq_residual(spark, emb, tmp_path):
    """partition_ds_uri assignments that disagree with the fresh ones must
    trigger PQ re-encoding against the STORED partition's centroid — a code
    encoded off one centroid but stored under another corrupts ADC."""
    import numpy as np
    import pyarrow.parquet as pq_mod

    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    uri = str(tmp_path / "ds")
    write_dataset(emb.limit(200).repartition(2), uri, mode="create")
    ds = dataset(uri)
    b = IndicesBuilder(ds, "embedding", spark)
    ivf = b.train_ivf(4, distance_type="l2", sample_rate=32)
    pq = b.train_pq(ivf, num_subvectors=4, sample_rate=32)

    # fresh (consistent) transform as the baseline
    work = str(tmp_path / "w")
    b.transform_vectors(ivf, pq, work + "/fresh")
    fresh = spark.read.parquet(work + "/fresh").select("id", "partition_id", "pq_code").toPandas()

    # adversarial precompute: rotate every assignment to a WRONG partition
    pre = fresh[["id", "partition_id"]].copy()
    pre["partition_id"] = (pre["partition_id"] + 1) % int(ivf.num_partitions)
    spark.createDataFrame(pre).write.mode("overwrite").parquet(work + "/pre")

    b.transform_vectors(ivf, pq, work + "/override", partition_ds_uri=work + "/pre")
    over = spark.read.parquet(work + "/override").select("id", "partition_id", "pq_code").toPandas()
    merged = fresh.merge(over, on="id", suffixes=("_f", "_o"))
    # partitions follow the precompute...
    assert (merged["partition_id_o"] == (merged["partition_id_f"] + 1) % int(ivf.num_partitions)).all()
    # ...and codes were RE-encoded: decoding code_o against centroid[pid_o]
    # must approximate the vector at least as well as the stale code would
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
            for r in spark.read.parquet(f"{tmp_path}/ds/data/*.parquet" if False else work + "/fresh").select("id", "vec").withColumnRenamed("id", "vec_id").withColumnRenamed("vec", "embedding").collect()}

    def decode(code, pid):
        cents = ivf.centroids
        m, _, sub = pq.codebook.shape
        parts = [pq.codebook[j][int(code[j])] for j in range(m)]
        return cents[int(pid)] + np.concatenate(parts)

    worse = 0
    for _, r in merged.head(50).iterrows():
        v = vecs[r["id"]]
        err_o = np.linalg.norm(v - decode(r["pq_code_o"], r["partition_id_o"]))
        # stale would be: code_f (residual vs centroid pid_f) stored under pid_o
        err_stale = np.linalg.norm(v - decode(r["pq_code_f"], r["partition_id_o"]))
        if err_o > err_stale + 1e-4:
            worse += 1
    assert worse == 0  # re-encoded codes are never worse than stale ones


def test_sample_sizes_prefilter_from_non_null_count(spark, emb, tmp_path):
    """On a mostly-null vector column the hash-bucket prefilter must be
    sized from the NON-NULL count (ADVICE r9 #3): sizing from count_rows()
    (which includes nulls) shrinks expected survivors by the null fraction
    — silently under-sampling and, at extreme fractions, raising 'no
    non-null vectors' despite plenty of rows."""
    from pyspark.sql import functions as F

    from lance_spark.dataset import dataset
    from lance_spark.write import write_dataset

    # 95% nulls: 25 real vectors in 500 rows
    sparse = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 20 == 0, F.col("embedding")).otherwise(F.lit(None)),
    )
    uri = str(tmp_path / "mostlynull")
    write_dataset(sparse, uri, mode="create")
    b = IndicesBuilder(dataset(uri), "embedding", spark)
    n_non_null = sparse.filter("embedding is not null").count()
    # ask for every non-null vector: the old sizing made `every` ≈ 10 and
    # kept ~1/10th of the 25 survivors; the fix must return all of them
    sample = b._sample(n_non_null, "l2")
    assert len(sample) == n_non_null
    ivf = b.train_ivf(num_partitions=4)
    assert ivf.num_partitions == 4
