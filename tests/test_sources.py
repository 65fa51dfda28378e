from __future__ import annotations

import pyarrow as pa


def test_read_media_files_and_attach(ray_session, tmp_path):
    from ocr_ray.sources import attach_media_payloads, read_media_files

    payloads = {f"img{i}.bin": bytes([i]) * (10 + i) for i in range(5)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)

    media = read_media_files(str(tmp_path))
    tbl = pa.Table.from_pylist(media.take_all())
    assert tbl.num_rows == 5
    assert set(tbl.column_names) == {"media_id", "media_ref", "payload"}
    by_ref = {
        r["media_ref"].rsplit("/", 1)[-1]: r["payload"] for r in tbl.to_pylist()
    }
    assert by_ref == payloads
    assert len(set(tbl.column("media_id").to_pylist())) == 5  # distinct ids

    # broadcast-attach payloads onto span rows
    import ray.data as rd

    spans = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["a", "b"], pa.string()),
                "media_ref": pa.array(
                    [tbl.column("media_ref")[0].as_py(), "missing://x"], pa.string()
                ),
            }
        )
    )
    joined = pa.Table.from_pylist(
        attach_media_payloads(spans, tbl).take_all()
    ).sort_by("doc_id")
    assert joined.column("payload")[0].as_py() == tbl.column("payload")[0].as_py()
    assert joined.column("payload")[1].as_py() is None


def test_jsonl_interleaved_round_trip(ray_session, tmp_path):
    """JSONL source yields the identical Arrow schema and rows as the
    parquet path, and the extraction pipeline is source-agnostic."""
    from ocr_ray import io as oio
    from ocr_ray import synth
    from ocr_ray.pipelines.extract import ExtractConfig, extract_documents

    table = synth.generate_interleaved(n_docs=40, seed=7)
    jdir = oio.write_interleaved_jsonl(table, str(tmp_path / "jsonl"), max_rows_per_file=16)
    pdir = oio.write_interleaved(table, str(tmp_path / "pq"), max_rows_per_file=16)

    ds_j = oio.read_interleaved_jsonl(jdir)
    back = pa.concat_tables(
        ds_j.iter_batches(batch_format="pyarrow")
    ).sort_by("doc_id")
    assert back.schema.equals(synth.INTERLEAVED_SCHEMA)
    assert back.equals(table.sort_by("doc_id"))

    # same extraction result from either source
    out_j = pa.Table.from_pylist(
        extract_documents(ds_j, ExtractConfig()).take_all()
    ).sort_by("doc_id")
    out_p = pa.Table.from_pylist(
        extract_documents(oio.read_interleaved(pdir), ExtractConfig()).take_all()
    ).sort_by("doc_id")
    assert out_j.equals(out_p)
