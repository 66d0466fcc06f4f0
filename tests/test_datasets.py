"""Dataset loader modules: import surface + offline cache behavior."""

import importlib

import pytest

MODULES = (
    "movielens netflix epinions filmtrust amazon_clothing amazon_office "
    "amazon_toy amazon_digital_music amazon_review citeulike tradesy "
    "cosmetics diginetica gowalla retailrocket tafeng yoochoose"
).split()


@pytest.mark.parametrize("name", MODULES)
def test_loader_module_surface(name):
    mod = importlib.import_module(f"cornac_tpu.datasets.{name}")
    load_fns = [f for f in dir(mod) if f.startswith("load")]
    assert load_fns, f"{name} exposes no load_* functions"
    for fn in load_fns:
        assert callable(getattr(mod, fn))


def test_movielens_variants_offline(monkeypatch, tmp_path):
    """No-network environment: loaders must attempt the cache download and
    surface a clean error (not hang or corrupt the cache dir)."""
    from cornac_tpu.datasets import movielens

    monkeypatch.setenv("CORNAC_TPU_CACHE", str(tmp_path))
    with pytest.raises(Exception):
        movielens.load_feedback(variant="100K")
    with pytest.raises(ValueError):
        movielens.load_feedback(variant="999Z")


def test_download_cache_path_traversal_guard(tmp_path):
    import zipfile

    from cornac_tpu.utils.download import _extract_archive

    evil = tmp_path / "evil.zip"
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("../outside.txt", "x")
    with pytest.raises(RuntimeError, match="traversal"):
        _extract_archive(str(evil), str(tmp_path / "out"))

    ok = tmp_path / "ok.zip"
    with zipfile.ZipFile(ok, "w") as zf:
        zf.writestr("inner/data.txt", "y")
    _extract_archive(str(ok), str(tmp_path / "out2"))
    assert (tmp_path / "out2" / "inner" / "data.txt").read_text() == "y"


def test_amazon_review_load_text_offline(tmp_path, monkeypatch):
    """load_text builds item content texts from cached meta (no network):
    attribute flattening, review-item alignment, empty-string fallback,
    separate description cache (reference datasets/amazon_review.py:149)."""
    import gzip
    import json

    import cornac_tpu.datasets.amazon_review as ar

    monkeypatch.setenv("CORNAC_TPU_CACHE", str(tmp_path))
    (tmp_path / "amazon_review").mkdir()
    with gzip.open(tmp_path / "amazon_review" / "beauty_2014.json.gz", "wt") as f:
        for u, i, r, t in [("u1", "iA", 5, 1), ("u2", "iB", 4, 2)]:
            f.write(
                json.dumps(
                    {"reviewerID": u, "asin": i, "overall": r, "unixReviewTime": t}
                )
                + "\n"
            )
    # 2014 meta files are python-literal lines, not strict JSON
    with gzip.open(tmp_path / "amazon_review" / "meta_beauty_2014.json.gz", "wt") as f:
        f.write(
            str(
                {
                    "asin": "iA", "title": "Lipstick", "price": 9.99,
                    "brand": "X", "categories": [["Beauty", "Makeup"]],
                    "description": "Nice.",
                }
            )
            + "\n"
        )
    monkeypatch.setattr(
        ar, "cache", lambda url, relative_path=None, **kw: str(tmp_path / relative_path)
    )

    texts, ids = ar.load_text("beauty")
    assert ids == ["iA", "iB"]
    assert texts[0] == "Title: Lipstick. Price: 9.99. Brand: X. Categories: Beauty, Makeup"
    assert texts[1] == ""  # item without metadata
    texts_d, _ = ar.load_text("beauty", include_description=True)
    assert texts_d[0].endswith("Description: Nice.")
