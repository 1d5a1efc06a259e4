"""Fixture tests for translation-fill operators vs plain-Python oracles
(SURVEY.md §5 item 1 — reference transform semantics)."""

import re

import pytest
from pyspark.sql import functions as F

from langtoolsosm_spark.operators import translate as tr


@pytest.fixture(scope="module")
def tables(spark, synth_dir):
    features = spark.read.parquet(f"{synth_dir}/features.parquet")
    wikidata = spark.read.parquet(f"{synth_dir}/wikidata.parquet")
    return features, wikidata


def _feat_rows(features):
    return [
        (r["osm_type"], r["id"], dict(r["tags"]))
        for r in features.select("osm_type", "id", "tags").collect()
    ]


def test_fill_empty_name_oracle(spark, tables):
    features, _ = tables
    got = {
        (r["osm_type"], r["id"]): (r["key"], r["value"])
        for r in tr.fill_empty_name(features, "ca").collect()
    }
    exp = {}
    for t, i, tags in _feat_rows(features):
        # reference src/fill_empty_name.py:26,63-64
        if "name:ca" in tags and "name" not in tags:
            exp[(t, i)] = ("name", tags["name:ca"])
    assert got == exp and len(exp) > 0


def test_fill_empty_name_lang_oracle(spark, tables):
    features, _ = tables
    got = {
        (r["osm_type"], r["id"]): r["value"]
        for r in tr.fill_empty_name_lang(features, "ca").collect()
    }
    exp = {
        (t, i): tags["name"]
        for t, i, tags in _feat_rows(features)
        if "name" in tags and "name:ca" not in tags
    }
    assert got == exp and len(exp) > 0


def test_regex_name_lang_backrefs(spark, tables):
    features, _ = tables
    find, replace = r"Carrer de (\w+)", r"C. \1"
    got = {
        (r["osm_type"], r["id"]): r["value"]
        for r in tr.regex_name_lang(features, find, replace, "oc").collect()
    }
    pat = re.compile(find)
    exp = {}
    for t, i, tags in _feat_rows(features):
        name = tags.get("name")
        if name and "name:oc" not in tags and pat.search(name):
            exp[(t, i)] = pat.sub(replace, name)
    assert got == exp and len(exp) > 0
    assert any(v.startswith("C. ") for v in got.values())


def test_derive_candidates_reference_semantics():
    # wikipedia with brackets, label lowercase, alias duplicates
    opts = tr.derive_candidates("Foo (bar)", "foo baz", ["Foo Baz", "quux"])
    # pass1 extras: "Foo" (from wikipedia); pass2: "Foo Baz" is title of
    # label but equals existing alias -> still added unless in seen-extras
    assert opts[0] == "Foo (bar)"  # rank-1 = wikipedia title verbatim
    assert "Foo" in opts  # bracket-stripped extra
    assert opts[-2:] == ["Foo Baz", "quux"]  # aliases last
    assert opts.index("Foo") < opts.index("foo baz")  # extras before label
    # empty translation -> no options
    assert tr.derive_candidates(None, None, None) == []
    # title-case extra derived from label when no brackets anywhere
    opts2 = tr.derive_candidates(None, "gran via", [])
    assert opts2 == ["Gran Via", "gran via"]


def test_translate_with_wikidata_consistent_per_qid(spark, tables):
    features, wikidata = tables
    edits = tr.translate_with_wikidata(features, wikidata, "ca")
    pdf = edits.toPandas()
    assert len(pdf) > 0
    # remember-answers: one value per Q-id
    assert (pdf.groupby("wikidata")["value"].nunique() == 1).all()
    # every edit's feature had name+wikidata and no name:ca
    fr = {(t, i): tags for t, i, tags in _feat_rows(features)}
    for _, r in pdf.iterrows():
        tags = fr[(r["osm_type"], r["id"])]
        assert "name" in tags and "wikidata" in tags and "name:ca" not in tags
        assert tags["wikidata"] == r["wikidata"]


def test_fill_wikidata_from_wikipedia_redirects(spark, tables):
    features, wikidata = tables
    edits = tr.fill_wikidata_from_wikipedia(features, wikidata).toPandas()
    # all edits target rows having wikipedia and lacking wikidata
    fr = {(t, i): tags for t, i, tags in _feat_rows(features)}
    assert len(edits) > 0
    for _, r in edits.iterrows():
        tags = fr[(r["osm_type"], r["id"])]
        assert "wikipedia" in tags and "wikidata" not in tags
        assert r["key"] == "wikidata" and r["value"].startswith("Q")


def test_fill_wikipedia_from_wikidata_antijoin_human(spark, tables):
    features, wikidata = tables
    edits = tr.fill_wikipedia_from_wikidata(features, wikidata, "ca").toPandas()
    humans = {
        r["wikidata"]
        for r in wikidata.filter(F.array_contains("p31_labels", "human")).collect()
    }
    fr = {(t, i): tags for t, i, tags in _feat_rows(features)}
    assert len(edits) > 0
    saw_redirect = False
    for _, r in edits.iterrows():
        tags = fr[(r["osm_type"], r["id"])]
        assert "wikidata" in tags and "wikipedia" not in tags
        assert tags["wikidata"] not in humans  # anti-join applied
        if r["key"] == "wikidata":
            saw_redirect = True
            assert r["value"] != tags["wikidata"]  # canonical correction
        else:
            assert r["value"].startswith("ca:")
    assert saw_redirect  # datagen plants redirect rows


def test_cdc_merge_skip_if_equal(spark, tables):
    features, _ = tables
    # edits: one real change, one no-op (same value), one new key
    base = features.limit(3).collect()
    rows = []
    t0, i0 = base[0]["osm_type"], base[0]["id"]
    some_key = list(base[0]["tags"].keys())[0]
    rows.append((t0, i0, some_key, base[0]["tags"][some_key]))  # no-op
    t1, i1 = base[1]["osm_type"], base[1]["id"]
    k1 = list(base[1]["tags"].keys())[0]
    rows.append((t1, i1, k1, "CHANGED VALUE"))  # real change
    t2, i2 = base[2]["osm_type"], base[2]["id"]
    rows.append((t2, i2, "brand_new_key", "v"))  # insert
    edits = spark.createDataFrame(rows, "osm_type string, id long, key string, value string")
    merged = tr.cdc_merge(features, edits)
    out = {(r["osm_type"], r["id"]): r for r in merged.collect()}
    assert merged.count() == features.count()
    r0 = out[(t0, i0)]
    assert not r0["changed"] and r0["version"] == base[0]["version"]  # skip-if-equal
    r1 = out[(t1, i1)]
    assert r1["changed"] and r1["tags"][k1] == "CHANGED VALUE"
    assert r1["version"] == base[1]["version"] + 1
    r2 = out[(t2, i2)]
    assert r2["changed"] and r2["tags"]["brand_new_key"] == "v"
    # conflict detection: only the real overwrite shows up
    conf = tr.conflict_keys(features, edits).collect()
    assert {(c["osm_type"], c["id"]) for c in conf} == {(t1, i1)}
    assert conf[0]["conflict_keys"] == [k1]


def test_predicates(spark, tables):
    features, _ = tables
    n_regex = features.filter(tr.key_regex_exists("tags", "name:[a-z]+")).count()
    exp = sum(
        1
        for _, _, tags in _feat_rows(features)
        if any(re.search("name:[a-z]+", k) and tags[k] for k in tags)
    )
    assert n_regex == exp > 0
