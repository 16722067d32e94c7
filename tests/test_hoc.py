"""HOC Concordance importer (reference importers/hoc_loader.py): þ-field
.dat parsing (odd-index values, short-row padding), .opt page grouping by
doc-start markers, title/category/date derivation."""

import pyarrow as pa

from epstein_pipeline_ray.sources.hoc import load_hoc_documents, read_dat, read_opt

TH = "þ"


def _dat_line(*vals):
    return "".join(TH + v + TH for v in vals)


def _write_fixture(tmp_path):
    fields = ["Bates Begin", "Bates End", "Author", "Custodian/Source",
              "Date Sent", "Date Created", "Document Extension",
              "Email From", "Email To", "Email Subject/Title",
              "Original Filename", "MD5 Hash", "Document Title"]
    rows = [
        # email doc, 2 pages, title from Document Title
        ["HOUSE_OVERSIGHT_000010", "HOUSE_OVERSIGHT_000011", "Alice", "Cust A",
         "03/15/2002", "", "msg", "a@x.com", "b@x.com", "Lunch",
         "mail1.msg", "abc123", "The Email"],
        # pdf financial by filename keyword; title falls back to subject
        ["HOUSE_OVERSIGHT_000012", "HOUSE_OVERSIGHT_000014", "", "",
         "", "07/04/1999", "pdf", "", "", "Invoice Q3",
         "tax_invoice.pdf", "", ""],
        # short row: only Bates Begin — everything else pads to ""
        ["HOUSE_OVERSIGHT_000015"],
    ]
    dat = tmp_path / "x.dat"
    lines = [_dat_line(*fields)]
    for r in rows:
        lines.append(_dat_line(*r))
    dat.write_text("\n".join(lines), encoding="utf-8")

    opt = tmp_path / "x.opt"
    opt_rows = [
        "HOUSE_OVERSIGHT_000010,VOL001,\\IMAGES\\a10.jpg,Y,,,2",
        "HOUSE_OVERSIGHT_000011,VOL001,\\IMAGES\\a11.jpg,,,,",
        "HOUSE_OVERSIGHT_000012,VOL001,\\IMAGES\\a12.jpg,Y,,,3",
        "HOUSE_OVERSIGHT_000013,VOL001,\\IMAGES\\a13.jpg,,,,",
        "HOUSE_OVERSIGHT_000014,VOL001,\\IMAGES\\a14.jpg,,,,",
        "HOUSE_OVERSIGHT_000015,VOL001,\\IMAGES\\a15.jpg,Y,,,1",
    ]
    opt.write_text("\n".join(opt_rows), encoding="utf-8")
    return str(opt), str(dat)


def test_read_dat_odd_index_values_and_padding(ray_session, tmp_path):
    opt, dat = _write_fixture(tmp_path)
    df = read_dat(dat).to_pandas()
    assert len(df) == 3
    row = df[df["Bates Begin"] == "HOUSE_OVERSIGHT_000010"].iloc[0]
    assert row["Document Title"] == "The Email" and row["Author"] == "Alice"
    short = df[df["Bates Begin"] == "HOUSE_OVERSIGHT_000015"].iloc[0]
    assert short["Document Title"] == "" and short["MD5 Hash"] == ""


def test_read_opt(ray_session, tmp_path):
    opt, dat = _write_fixture(tmp_path)
    df = read_opt(opt).to_pandas().sort_values("bates_num")
    assert df.doc_start.tolist() == [True, False, True, False, False, True]
    assert df.bates_num.tolist() == [10, 11, 12, 13, 14, 15]
    assert df.page_count.tolist()[0] == 2


def test_load_hoc_documents(ray_session, tmp_path):
    opt, dat = _write_fixture(tmp_path)
    df = load_hoc_documents(opt, dat).to_pandas().sort_values("doc_id")
    assert df.doc_id.tolist() == ["kaggle-ho-000010", "kaggle-ho-000012",
                                  "kaggle-ho-000015"]
    assert df.n_pages.tolist() == [2, 3, 1]
    assert df.bates_end.tolist() == ["HOUSE_OVERSIGHT_000011",
                                     "HOUSE_OVERSIGHT_000014",
                                     "HOUSE_OVERSIGHT_000015"]
    # nested pages column: list<struct{bates_id, image_path}> in page order
    pages0 = df.iloc[0]["pages"]
    assert [p["bates_id"] for p in pages0] == ["HOUSE_OVERSIGHT_000010",
                                               "HOUSE_OVERSIGHT_000011"]
    assert all("IMAGES" in p["image_path"] for p in pages0)
    # title fallbacks: doc_title, then email subject, then bates
    assert df.title.tolist() == ["The Email", "Invoice Q3",
                                 "HOUSE_OVERSIGHT_000015"]
    # categories: msg→correspondence, pdf+invoice filename→financial
    assert df.category.tolist() == ["correspondence", "financial", "other"]
    # best_date: sent preferred over created, MM/DD/YYYY → ISO
    assert df.best_date.tolist()[:2] == ["2002-03-15", "1999-07-04"]


def test_load_hoc_without_dat(ray_session, tmp_path):
    opt, dat = _write_fixture(tmp_path)
    df = load_hoc_documents(opt, None).to_pandas().sort_values("doc_id")
    assert len(df) == 3 and df.n_pages.tolist() == [2, 3, 1]
    # no metadata → bates fallback titles, 'other' category
    assert df.title.tolist() == [f"HOUSE_OVERSIGHT_{n:06d}" for n in (10, 12, 15)]
    assert set(df.category) == {"other"}


def test_load_hoc_exchange_asof_plan(ray_session, tmp_path):
    """VERDICT r2 item 5: forced broadcast_rows_limit=0 routes doc
    assignment through the bucketed-exchange as-of; output equals the
    broadcast plan (bucket width 3 forces pages of one doc to straddle
    bucket boundaries, exercising the carry-in seeds)."""
    import pandas as pd

    opt, dat = _write_fixture(tmp_path)

    def norm(df):
        df = df.drop(columns=["pages"]).sort_values("doc_id").reset_index(drop=True)
        return df

    base = norm(load_hoc_documents(opt, dat).to_pandas())
    forced = norm(load_hoc_documents(opt, dat, broadcast_rows_limit=0,
                                     asof_bucket_width=3).to_pandas())
    pd.testing.assert_frame_equal(base, forced)
    # nested pages column equality (list<struct> — compare as plain lists)
    b = load_hoc_documents(opt, dat).to_pandas().sort_values("doc_id")
    f = load_hoc_documents(opt, dat, broadcast_rows_limit=0,
                           asof_bucket_width=3).to_pandas().sort_values("doc_id")
    assert [list(map(dict, p)) for p in b.pages] == [list(map(dict, p)) for p in f.pages]
