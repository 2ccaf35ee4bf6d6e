"""DMS-behavior tests — pin the Tier-R semantics including the documented
bug deviations (SURVEY.md §2 notes B1-B4, FIXTURES.md §B)."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dmshadoop_spark.dms import DocumentStore, extract_metadata


def make_png(width: int = 320, height: int = 200) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", width, height)
        + b"\x08\x02\x00\x00\x00"
    )


def make_jpeg(width: int = 320, height: int = 240) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", height, width) + b"\x01\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


@pytest.fixture()
def store(spark, tmp_path):
    return DocumentStore(spark, str(tmp_path / "dms"))


def test_b1_numeric_latest_version(store):
    """12 versions: latest must be 12, not lexicographic 9 (src/DMS.py:391)."""
    for i in range(12):
        v = store.upload("report.txt", f"report rev {i}".encode())
        assert v == i + 1
    assert store.get_lastest_version("report.txt") == 12
    assert store.download("report.txt") == b"report rev 11"


def test_b2_anchored_name_match(store):
    """'a.txt' versions must not include 'bba.txt' rows (src/DMS.py:373)."""
    store.upload("a.txt", b"alpha v1")
    store.upload("a.txt", b"alpha v2")
    store.upload("bba.txt", b"beta v1")
    assert store.get_file_version("a.txt") == [1, 2]
    assert store.get_file_version("bba.txt") == [1]


def test_b3_dotted_filename(store):
    """'my.doc.txt' survives delete_all bookkeeping intact (src/DMS.py:413)."""
    for i in range(3):
        store.upload("my.doc.txt", f"v{i}".encode())
    assert store.get_file_version("my.doc.txt") == [1, 2, 3]
    store.delete("my.doc.txt", 2)
    assert store.get_file_version("my.doc.txt") == [1, 3]
    store.delete_all()
    assert store.get_file_version("my.doc.txt") == []


def test_b4_colon_metadata_split_first_colon_only():
    """'- Creation date: 2014-04-25 14:22:33' keeps the full value
    (the reference kept split(':')[1] → ' 2014-04-25 14')."""
    meta = extract_metadata(b"- Creation date: 2014-04-25 14:22:33\nbody")
    assert meta["Creation date"] == "2014-04-25 14:22:33"


def test_version_gap_next_is_max_plus_one(store):
    """Versions {1,3} (2 deleted) → next upload gets 4 (W2 semantics)."""
    for _ in range(3):
        store.upload("gap.txt", b"x")
    assert store.delete("gap.txt", 2)
    assert store.get_file_version("gap.txt") == [1, 3]
    assert store.upload("gap.txt", b"y") == 4


def test_binary_ingest_and_image_dimensions(store):
    png = make_png(320, 200)
    store.upload("pic.png", png)
    meta = store.get_file_meta_data("pic.png")
    assert meta["content_type"] == "image/png"
    assert (meta["width"], meta["height"]) == ("320", "200")
    assert store.download("pic.png") == png

    jpg = make_jpeg(640, 480)
    meta2 = extract_metadata(jpg)
    assert meta2["content_type"] == "image/jpeg"
    assert (meta2["width"], meta2["height"]) == ("640", "480")


def test_append_commit_is_crash_atomic(store, tmp_path):
    """Inserts are generation commits: an unmarked gen dir (simulated
    crash) is invisible to readers and swept by the next insert; old
    generations stay immutable so in-flight readers are never torn."""
    import os

    store.upload("a.txt", b"v1")
    base = store.base_dir
    gen0_files = sorted(os.listdir(os.path.join(base, "gen=0")))

    # Simulate a crash mid-commit: gen=1 exists but has no _SUCCESS.
    torn = os.path.join(base, "gen=1")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-torn.parquet"), "wb") as f:
        f.write(b"\x00garbage")
    assert store.get_file_version("a.txt") == [1]  # torn gen invisible
    assert store.download("a.txt") == b"v1"

    # Next insert sweeps the debris and commits a complete gen=1.
    assert store.upload("a.txt", b"v2") == 2
    assert store.download("a.txt") == b"v2"
    assert store.download("a.txt", 1) == b"v1"
    assert os.path.exists(os.path.join(base, "gen=1", "_SUCCESS"))
    assert not os.path.exists(os.path.join(base, "gen=1", "part-torn.parquet"))
    # gen=0 untouched by the insert (snapshot immutability)
    assert sorted(os.listdir(os.path.join(base, "gen=0"))) == gen0_files


def test_gif_dimensions():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00"
    meta = extract_metadata(gif)
    assert meta["content_type"] == "image/gif"
    assert (meta["width"], meta["height"]) == ("320", "200")


def test_time_travel_generations(store):
    """df(generation=N) reads the immutable historical snapshot; history()
    lists committed generations only."""
    store.upload("t.txt", b"v1")          # gen 0
    store.upload("t.txt", b"v2")          # gen 1
    assert store.delete("t.txt", 1)       # gen 2 (v1 removed)
    assert store.history() == [0, 1, 2]
    assert store.df(0).count() == 1
    assert store.df(1).count() == 2
    assert sorted(r["version"] for r in store.df(2).collect()) == [2]
    with pytest.raises(ValueError):
        store.df(99)


def test_exif_roundtrip_all_fields():
    """encode_exif_jpeg → extract_metadata recovers every written field,
    including the colon-bearing datetime (the B4 class of value)."""
    from dmshadoop_spark.multimodal import encode_exif_jpeg

    jpg = encode_exif_jpeg(
        640, 480, make="dmshadoop", model="cam-es",
        datetime="2014:04:25 14:22:33", iso=400,
    )
    meta = extract_metadata(jpg)
    assert meta["content_type"] == "image/jpeg"
    assert (meta["width"], meta["height"]) == ("640", "480")
    assert meta["exif_make"] == "dmshadoop"
    assert meta["exif_model"] == "cam-es"
    assert meta["exif_datetime"] == "2014:04:25 14:22:33"
    assert meta["exif_datetime_original"] == "2014:04:25 14:22:33"
    assert meta["exif_iso"] == "400"
    assert (meta["exif_pixel_x"], meta["exif_pixel_y"]) == ("640", "480")
    # deterministic encoder (the x6_exif_meta oracle depends on it)
    assert jpg == encode_exif_jpeg(
        640, 480, make="dmshadoop", model="cam-es",
        datetime="2014:04:25 14:22:33", iso=400,
    )


def test_exif_big_endian_tiff():
    """The IFD walk honors MM byte order (hand-built: one Make entry)."""
    from dmshadoop_spark.dms.extract import _parse_tiff_exif

    make = b"bigend\x00"
    tiff = (
        b"MM\x00\x2a" + struct.pack(">I", 8)           # header → IFD0 at 8
        + struct.pack(">H", 1)                          # 1 entry
        + struct.pack(">HHI", 0x010F, 2, len(make))     # Make, ASCII
        + struct.pack(">I", 8 + 2 + 12 + 4)             # value offset
        + struct.pack(">I", 0)                          # next IFD
        + make
    )
    assert _parse_tiff_exif(tiff) == {"exif_make": "bigend"}


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_exif_parser_never_raises_on_junk(junk):
    """Malformed APP1 payloads must degrade to partial/empty maps, never
    exceptions — the extraction UDF runs on arbitrary ingested bytes."""
    framed = (
        b"\xff\xd8\xff\xe1"
        + struct.pack(">H", len(junk) + 8)
        + b"Exif\x00\x00"
        + junk
    )
    extract_metadata(framed)
    extract_metadata(b"\xff\xd8" + junk)


def test_update_works_and_bumps_content(store):
    """The reference's update() is dead code (undefined t, src/DMS.py:228);
    ours must actually replace content in place."""
    store.upload("u.txt", b"old v1")
    store.upload("u.txt", b"old v2")
    assert store.update("u.txt", b"new v2")
    assert store.download("u.txt", 2) == b"new v2"
    assert store.download("u.txt", 1) == b"old v1"
    assert store.get_file_version("u.txt") == [1, 2]
    assert not store.update("missing.txt", b"zz")


def test_delete_all_version_and_missing(store):
    store.upload("d.txt", b"1")
    store.upload("d.txt", b"2")
    store.upload("keep.txt", b"k")
    assert store.delete_all_version("d.txt")
    assert store.get_file_version("d.txt") == []
    assert store.get_file_version("keep.txt") == [1]
    assert not store.delete_all_version("d.txt")
    assert not store.delete("d.txt")


def test_search_tf_ranked(store):
    store.upload("a.txt", b"spark join spark window")
    store.upload("b.txt", b"join filter scan")
    store.upload("c.txt", b"nothing relevant")
    store.upload("pic.png", make_png())  # non-text must be ignored
    rows = store.search("spark join").collect()
    names = [(r["name"], r["score"]) for r in rows]
    assert names[0] == ("a.txt", 3)
    assert ("b.txt", 1) in names
    assert all(n != "c.txt" for n, _ in names)


def test_metadata_has_ingest_fields(store):
    store.upload("m.txt", b"hello world")
    meta = store.get_file_meta_data("m.txt")
    assert meta["length"] == "11"
    assert meta["word_count"] == "2"
    assert len(meta["sha256"]) == 64


@settings(max_examples=5, deadline=None)
@given(
    content=st.binary(min_size=0, max_size=512),
    n_versions=st.integers(min_value=1, max_value=3),
)
def test_roundtrip_property(spark, tmp_path_factory, content, n_versions):
    """upload→download round-trip preserves bytes; version monotonic."""
    store = DocumentStore(
        spark, str(tmp_path_factory.mktemp("dms_prop"))
    )
    for i in range(n_versions):
        assert store.upload("f.bin", content + bytes([i])) == i + 1
    got = store.download("f.bin")
    assert got == content + bytes([n_versions - 1])


def test_bulk_ingest_versions_and_metadata(spark, store):
    """Distributed ingest: one job, set-oriented version assignment that
    composes with pre-existing versions."""
    store.upload("a.txt", b"existing v1")
    batch = spark.createDataFrame(
        [
            ("a.txt", b"bulk one"),
            ("a.txt", b"bulk two longer"),
            ("b.txt", b"fresh doc"),
        ],
        "name string, content binary",
    )
    assert store.bulk_ingest(batch) == 3
    assert store.get_file_version("a.txt") == [1, 2, 3]
    assert store.get_file_version("b.txt") == [1]
    meta = store.get_file_meta_data("b.txt")
    assert meta["content_type"] == "text/plain"
    assert meta["length"] == "9"
    # shorter content got the lower version (deterministic ordering)
    assert store.download("a.txt", 2) == b"bulk one"
    assert store.download("a.txt", 3) == b"bulk two longer"


def test_generation_diff(store):
    """diff(gen_a, gen_b) is the change-data feed between two immutable
    snapshots: inserts/deletes/updates by document key, no false updates
    from carried-over rows."""
    store.upload("a.txt", b"one")             # gen 0
    store.upload("b.txt", b"bee")             # gen 1
    g1 = store.history()[-1]
    assert store.update("a.txt", b"ONE", version=1)   # gen 2
    assert store.delete("b.txt", 1)           # gen 3
    store.upload("c.txt", b"sea")             # gen 4
    g2 = store.history()[-1]
    changes = {
        (r.change_type, r.name, r.version)
        for r in store.diff(g1, g2).collect()
    }
    assert changes == {
        ("update", "a.txt", 1),
        ("delete", "b.txt", 1),
        ("insert", "c.txt", 1),
    }
    assert store.diff(g2, g2).count() == 0
    # reverse direction flips insert/delete
    rev = {
        (r.change_type, r.name, r.version)
        for r in store.diff(g2, g1).collect()
    }
    assert ("insert", "b.txt", 1) in rev and ("delete", "c.txt", 1) in rev


def test_compact_preserves_rows_and_shrinks_files(store):
    """compact() must rewrite the snapshot into the target file count as a
    new generation with ZERO row changes (empty diff), leaving history
    time-travelable."""
    import glob

    for i in range(6):
        store.upload(f"c{i}.txt", f"payload-{i}".encode())
    before_gen = store.history()[-1]
    n_before = store.df().count()
    files_before = glob.glob(f"{store._gen_path(before_gen)}/*.parquet")
    assert len(files_before) >= 6  # one appended part-file per upload
    new_gen = store.compact(target_files=1)
    assert new_gen == before_gen + 1
    files_after = glob.glob(f"{store._gen_path(new_gen)}/*.parquet")
    assert len(files_after) == 1
    assert store.df().count() == n_before
    assert store.diff(before_gen, new_gen).count() == 0
    assert store.df(before_gen).count() == n_before  # time travel intact


def test_vacuum_drops_old_generations_keeps_data(store):
    """vacuum() removes old generation dirs; hardlinked data reachable from
    the kept snapshot must remain fully readable (shared inodes)."""
    import pytest as _pytest

    store.upload("v.txt", b"alpha")
    store.upload("v.txt", b"beta")
    store.upload("w.txt", b"gamma")
    gens = store.history()
    assert len(gens) >= 3
    removed = store.vacuum(keep_last=1)
    assert removed == gens[:-1]
    assert store.history() == [gens[-1]]
    # data (incl. content linked from the oldest commit) still reads back
    assert store.download("v.txt", 1) == b"alpha"
    assert store.download("w.txt") == b"gamma"
    with _pytest.raises(ValueError):
        store.df(removed[0])


@given(st.binary(max_size=512))
@settings(max_examples=200, deadline=None)
def test_container_parsers_never_crash_on_junk(junk):
    """parse_mp3/parse_mp4/decode_jpeg run on arbitrary ingested bytes
    inside Arrow-batched UDFs — malformed input must surface as the
    documented ValueError/NotImplementedError (callers fall back), never
    as IndexError/struct.error/unbounded recursion. extract_metadata must
    never raise at all."""
    from dmshadoop_spark.multimodal import parse_mp3, parse_mp4
    from dmshadoop_spark.multimodal.jpeg import decode_jpeg

    for parser in (parse_mp3, parse_mp4, decode_jpeg):
        try:
            parser(junk)
        except (ValueError, NotImplementedError):
            pass
    # past-the-magic junk: a valid SOI followed by garbage exercises the
    # marker walk / entropy decode, not just the signature check
    # (round-3 ADVICE: truncated streams leaked IndexError/struct.error)
    try:
        decode_jpeg(b"\xff\xd8" + junk)
    except (ValueError, NotImplementedError):
        pass
    extract_metadata(junk)
    # framed variants: valid magics with junk bodies
    extract_metadata(b"\x00\x00\x00\x14ftyp" + junk)
    extract_metadata(b"ID3" + junk)
    extract_metadata(b"\xff\xfb" + junk)


def test_reference_demo_flow_real_fixture(store):
    """The reference's own demo (demo/demo.py:14): upload its JPEG
    fixture into the store, read metadata back (the hachoir surface,
    src/DMS.py:70-91), and — beyond reference parity — decode the actual
    pixels with our progressive-JPEG codec."""
    import os

    import numpy as np

    from dmshadoop_spark.multimodal import decode_jpeg

    path = "/root/reference/demo/example_picture.jpg"
    if not os.path.exists(path):
        pytest.skip("reference fixture not present")
    blob = open(path, "rb").read()
    v = store.upload("example_picture.jpg", blob)
    assert v == 1
    meta = store.get_file_meta_data("example_picture.jpg")
    assert meta["content_type"] == "image/jpeg"
    # SOF2 dims surface through the segment walk (438 wide, 431 high)
    assert (meta["width"], meta["height"]) == ("438", "431")
    back = store.download("example_picture.jpg")
    assert back == blob  # byte-exact round trip through the store
    arr = decode_jpeg(back)
    assert arr.shape == (431, 438, 3)
    assert 150 < float(np.mean(arr)) < 185  # a real photo, not noise


def test_sniff_mp3_requires_full_frame_not_sync_prefix():
    """The 2-byte MPEG sync (FF Ex) over-matches: a UTF-16-LE BOM is
    FF FE and can even form a structurally valid 4-byte frame header by
    chance, so the sniffer demands a SECOND consecutive frame at the
    first frame's computed boundary (or an exact single-frame stream)
    before claiming audio/mpeg (round-3 ADVICE)."""
    from dmshadoop_spark.dms.extract import _sniff
    from dmshadoop_spark.multimodal import encode_mp3
    from dmshadoop_spark.multimodal.containers import _mp3_frame_at

    assert _sniff("hello utf-16 document".encode("utf-16")) == (
        "application/octet-stream"
    )
    assert _sniff(b"\xff\xe7\x00\x00junk") == "application/octet-stream"
    mp3 = encode_mp3(10, 128, 44100)
    assert _sniff(mp3) == "audio/mpeg"
    frame_len = _mp3_frame_at(mp3, 0)[0]
    assert _sniff(mp3[:frame_len]) == "audio/mpeg"       # exact single frame
    assert _sniff(b"ID3" + bytes(20)) == "audio/mpeg"    # tagged stream


def test_codec_family_raises_only_valueerror_on_malformed():
    """The whole codec family (not just decode_jpeg) surfaces malformed
    input as the documented ValueError: truncations and mutations of
    VALID payloads — which get past the magic check into the real parse —
    must never leak IndexError/struct.error/zlib.error."""
    import numpy as np

    from dmshadoop_spark.multimodal import (
        decode_jpeg, decode_png, encode_avi, encode_jpeg, encode_png,
        encode_wav, parse_avi, parse_wav,
    )

    img = (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3) * 7 % 251)
    fixtures = [
        (decode_png, encode_png(img.astype(np.uint8))),
        (decode_jpeg, encode_jpeg(img.astype(np.uint8), quality=80)),
        (parse_wav, encode_wav(np.arange(300, dtype=np.int16), 8000)),
        (parse_avi, encode_avi([b"abc", b"defg"], 10)),
    ]
    import random

    rng = random.Random(5)
    for fn, valid in fixtures:
        fn(valid)  # the unmutated payload must still parse
        for cut in range(0, len(valid), 7):
            try:
                fn(valid[:cut])
            except (ValueError, NotImplementedError):
                pass
        b = bytearray(valid)
        for _ in range(300):
            i = rng.randrange(len(b))
            old = b[i]
            b[i] = rng.randrange(256)
            try:
                fn(bytes(b))
            except (ValueError, NotImplementedError):
                pass
            finally:
                b[i] = old


def test_pdf_metadata_extraction():
    """PDF metadata surface: Info-dict strings (literal with escapes AND
    UTF-16BE hex form), page count including FlateDecode-hidden pages,
    version from the header; wired through extract_metadata."""
    import zlib

    from dmshadoop_spark.multimodal import encode_pdf, parse_pdf

    pdf = encode_pdf(3, title="Quarterly Report", author="J. Doe",
                     producer="dmshadoop")
    m = parse_pdf(pdf)
    assert m["page_count"] == "3" and m["pdf_title"] == "Quarterly Report"
    assert m["pdf_version"] == "1.4"

    esc = pdf.replace(b"(Quarterly Report)", rb"(Line\)A\n\101)")
    assert parse_pdf(esc)["pdf_title"] == "Line)A\nA"
    hexed = pdf.replace(b"/Author (J. Doe)", b"/Author <FEFF004A00F6>")
    assert parse_pdf(hexed)["pdf_author"] == "Jö"

    # a page object hidden inside a FlateDecode object stream
    hidden = zlib.compress(b"<< /Type /Page /Parent 2 0 R >>")
    with_stream = pdf.replace(
        b"\nxref\n0 ",
        b"\n9 0 obj\n<< /Filter /FlateDecode /Length %d >>\nstream\n" % len(hidden)
        + hidden + b"\nendstream\nendobj\nxref\n0 ",
    )
    assert parse_pdf(with_stream)["page_count"] == "4"

    meta = extract_metadata(pdf)
    assert meta["content_type"] == "application/pdf"
    assert meta["page_count"] == "3" and meta["pdf_title"] == "Quarterly Report"


# --------------------------------------------------------------------------
# merge-on-read deletion vectors (round-10 verdict task 1)
# --------------------------------------------------------------------------


def _names(store):
    return sorted(r["name"] for r in store.df().select("name").collect())


def test_delete_is_tombstone_commit_not_rewrite(store):
    """delete() must commit a deletion vector: every data file of the new
    generation inode-shared with the previous generation (zero data
    rewritten), one tombstone file, one tombstone row — and reads
    exclude the key."""
    for i in range(4):
        store.upload(f"d{i}.txt", f"body {i}".encode())
    assert store.delete("d1.txt")
    lay = store.layout()
    assert lay["tombstone_rows"] == 1
    assert lay["tombstone_files"] == 1
    assert lay["data_files"] == lay["data_files_shared_with_prev"] > 0
    assert _names(store) == ["d0.txt", "d2.txt", "d3.txt"]
    # deleted key reports absent through every read-path method
    assert store.download("d1.txt") is None
    assert store.get_file_version("d1.txt") == []
    assert store.get_lastest_version("d1.txt") is None


def test_delete_missing_returns_false_without_commit(store):
    store.upload("a.txt", b"x")
    gens = store.history()
    assert not store.delete("nope.txt")
    assert not store.delete("a.txt", version=9)
    assert store.history() == gens  # no commit happened


def test_insert_after_delete_does_not_resurrect(store):
    """_append_commit must carry the tombstone sidecar forward: an insert
    after a delete keeps the deleted key invisible."""
    store.upload("a.txt", b"one")
    store.upload("b.txt", b"two")
    assert store.delete("a.txt")
    store.upload("c.txt", b"three")
    assert _names(store) == ["b.txt", "c.txt"]
    lay = store.layout()
    assert lay["tombstone_rows"] == 1


def test_delete_version_scoped_and_reupload_never_reuses_version(store):
    """Tombstones are (name, version) keyed: deleting the latest version
    exposes the previous one. A re-upload after deletes must NOT reuse a
    tombstoned version number — a reused key would be masked on read by
    the old deletion vector (the bug this test originally caught) and
    would break snapshot identity for diff/time travel."""
    v1 = store.upload("a.txt", b"v1")
    v2 = store.upload("a.txt", b"v2")
    assert (v1, v2) == (1, 2)
    assert store.delete("a.txt")  # latest = v2
    assert store.get_file_version("a.txt") == [1]
    assert store.download("a.txt") == b"v1"
    assert store.delete_all_version("a.txt")
    assert store.get_file_version("a.txt") == []
    # next upload continues PAST the tombstoned versions
    assert store.upload("a.txt", b"v3") == 3
    assert store.download("a.txt") == b"v3"
    # bulk_ingest takes the same tombstone-aware base version
    batch = store.spark.createDataFrame(
        [("a.txt", bytearray(b"v4"))], "name string, content binary"
    )
    assert store.bulk_ingest(batch) == 1
    assert store.get_file_version("a.txt") == [3, 4]
    assert store.download("a.txt") == b"v4"


def test_compact_folds_tombstones(store):
    """compact() is the copy-on-write half: the rewritten generation
    physically drops tombstoned rows and carries no sidecar."""
    for i in range(3):
        store.upload(f"d{i}.txt", f"b{i}".encode())
    store.delete("d0.txt")
    before = _names(store)
    store.compact()
    lay = store.layout()
    assert lay["tombstone_rows"] == lay["tombstone_files"] == 0
    assert _names(store) == before == ["d1.txt", "d2.txt"]


def test_time_travel_and_diff_across_tombstone_commits(store):
    """Each delete commit is a normal immutable generation: time travel
    to the pre-delete snapshot still sees the row; diff reports the
    delete."""
    store.upload("a.txt", b"one")
    store.upload("b.txt", b"two")
    g_before = store.history()[-1]
    store.delete("a.txt")
    g_after = store.history()[-1]
    assert sorted(
        r["name"] for r in store.df(g_before).select("name").collect()
    ) == ["a.txt", "b.txt"]
    changes = sorted(
        (r["change_type"], r["name"])
        for r in store.diff(g_before, g_after).collect()
    )
    assert changes == [("delete", "a.txt")]


def test_tombstone_read_plan_broadcasts_and_scans_data_once(store):
    """The merge-on-read scan must be: ONE scan of the generation's data
    files, anti-joined against a BROADCAST tombstone set — no shuffle of
    the data side, no second data pass, and the tombstone sidecar never
    appears in the data scan's file listing."""
    for i in range(3):
        store.upload(f"d{i}.txt", f"b{i}".encode())
    store.delete("d0.txt")
    df = store.df()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    import re

    spark = store.spark
    fmt = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    locs = re.findall(r"Location:.*?\[(.*?)\]", fmt)
    assert len(locs) == 2  # one data scan + one tombstone scan, no more
    gen = store.history()[-1]
    tomb_locs = [p for p in locs if "_tombstones" in p]
    data_locs = [p for p in locs if "_tombstones" not in p]
    assert len(tomb_locs) == len(data_locs) == 1
    # the data scan reads the CURRENT generation and the hidden-file
    # filter keeps the sidecar out of it
    assert f"gen={gen}" in data_locs[0]


# --------------------------------------------------------------------------
# MP3 Xing/LAME/VBRI VBR headers (round-10 verdict task 8)
# --------------------------------------------------------------------------


def test_mp3_vbr_xing_roundtrip():
    """encode_mp3_vbr → parse_vbr_header recovers the stated frame
    count, exact byte count, and encoder; parse_mp3 derives the
    header-based duration fields; walk-derived fields keep counting the
    metadata frame (it is a spec-valid frame)."""
    from dmshadoop_spark.multimodal import (
        encode_mp3_vbr,
        parse_mp3,
        parse_vbr_header,
    )

    data = encode_mp3_vbr([96, 128, 160, 192, 96, 128], 44100)
    v = parse_vbr_header(data)
    assert v["tag"] == "Xing" and v["frames"] == 6
    assert v["bytes"] == len(data)
    assert v["encoder"] == "LAME3.100"
    m = parse_mp3(data)
    assert m["n_frames"] == 7  # walk includes the metadata frame
    assert m["vbr_frames"] == 6
    assert m["total_samples_vbr"] == 6 * 1152
    assert abs(m["duration_vbr"] - 6 * 1152 / 44100) < 1e-12


def test_mp3_vbr_truncated_fetch_reports_stated_duration():
    """The crawled-audio case the round-10 verdict flagged: a partially
    fetched VBR file's walk under-reports, the Xing header still states
    the full stream."""
    from dmshadoop_spark.multimodal import encode_mp3_vbr, parse_mp3

    data = encode_mp3_vbr([96, 128, 160, 192] * 5, 44100)  # 20 frames
    cut = parse_mp3(data[: len(data) // 3])
    assert cut["n_frames"] < 21  # walk sees only the fetched prefix
    assert cut["vbr_frames"] == 20  # header states the whole file
    assert cut["total_samples_vbr"] == 20 * 1152


def test_mp3_info_tag_and_cbr_without_header():
    from dmshadoop_spark.multimodal import (
        encode_mp3,
        encode_mp3_vbr,
        parse_mp3,
        parse_vbr_header,
    )

    assert parse_vbr_header(encode_mp3_vbr([128] * 4, tag="Info"))["tag"] == "Info"
    plain = encode_mp3(5)
    assert parse_vbr_header(plain) is None
    assert "vbr_tag" not in parse_mp3(plain)  # dict shape unchanged


def test_mp3_vbri_header():
    """Fraunhofer VBRI: fixed 36-byte offset, its own field layout."""
    from dmshadoop_spark.multimodal import encode_mp3, parse_vbr_header

    f = bytearray(encode_mp3(1))
    f[36:40] = b"VBRI"
    f[40:42] = (1).to_bytes(2, "big")   # version
    f[44:46] = (80).to_bytes(2, "big")  # quality
    f[46:50] = (9999).to_bytes(4, "big")  # bytes
    f[50:54] = (42).to_bytes(4, "big")  # frames
    v = parse_vbr_header(bytes(f) + encode_mp3(3))
    assert v == {
        "tag": "VBRI",
        "frames": 42,
        "bytes": 9999,
        "quality": 80,
        "encoder": None,
    }


def test_mp3_vbr_parser_never_misfires_on_payload_junk():
    """Zeroed / arbitrary payload bytes in the first frame must not be
    read as a VBR header, and flag-gated fields absent from a short
    frame return None instead of raising."""
    from dmshadoop_spark.multimodal import encode_mp3, parse_vbr_header

    assert parse_vbr_header(encode_mp3(3, 128, 44100)) is None
    # a Xing tag with ALL flag bits set but a frame too short to carry
    # the fields: parser must not raise
    f = bytearray(encode_mp3(1, 32, 44100))  # short 104-byte frame
    p = 4 + 32
    f[p : p + 4] = b"Xing"
    f[p + 4 : p + 8] = (0xF).to_bytes(4, "big")
    v = parse_vbr_header(bytes(f))
    assert v is not None and v["tag"] == "Xing"


def test_delete_commit_is_crash_atomic(store):
    """Deletion-vector commits follow the same all-or-nothing discipline
    as inserts: a torn delete generation (no _SUCCESS) is invisible —
    the key still reads back — and the next commit sweeps the debris."""
    import os

    store.upload("a.txt", b"v1")
    store.upload("b.txt", b"v2")
    base = store.base_dir
    # simulate a crash mid-delete-commit: gen=2 dir without _SUCCESS
    torn = os.path.join(base, "gen=2")
    os.makedirs(os.path.join(torn, "_tombstones"))
    with open(os.path.join(torn, "_tombstones", "part-torn.parquet"), "wb") as f:
        f.write(b"\x00garbage")
    assert store.history() == [0, 1]
    assert store.download("a.txt") == b"v1"  # torn tombstone invisible
    # the next real delete sweeps the debris and commits cleanly
    assert store.delete("a.txt")
    assert store.history() == [0, 1, 2]
    assert os.path.exists(os.path.join(base, "gen=2", "_SUCCESS"))
    assert not os.path.exists(
        os.path.join(base, "gen=2", "_tombstones", "part-torn.parquet")
    )
    assert store.download("a.txt") is None
    assert store.download("b.txt") == b"v2"


def test_compact_cluster_by_gives_disjoint_file_ranges(store):
    """compact(cluster_by=['name']) must produce part files with
    DISJOINT name ranges (parquet footer min/max), so point probes —
    the data-dependent half of a deletion-vector delete — skip every
    non-matching file. Rows are unchanged."""
    import os

    import pyarrow.parquet as pq

    for i in range(40):
        store.upload(f"doc-{i:03d}.txt", f"body {i}".encode())
    before = _names(store)
    store.compact(4, cluster_by=["name"])
    assert _names(store) == before
    gdir = store._gen_path(store.history()[-1])
    ranges = []
    for fn in sorted(os.listdir(gdir)):
        if fn.startswith(("_", ".")) or not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(gdir, fn)).metadata
        col = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }["name"]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2  # range partitioning actually split
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (boundary equality allowed)


def test_delete_where_bulk_tombstone_commit(store):
    """Predicate-shaped bulk delete: one tombstone commit covering every
    matching key, data files inode-shared, column-pruned scan; zero
    matches commits nothing."""
    for i in range(6):
        store.upload(f"d{i}.txt", (b"x" * (10 + i)))
    n = store.delete_where(F_len_ge_13())
    assert n == 3  # lengths 13, 14, 15
    assert _names(store) == ["d0.txt", "d1.txt", "d2.txt"]
    lay = store.layout()
    assert lay["tombstone_rows"] == 3
    assert lay["data_files"] == lay["data_files_shared_with_prev"] > 0
    gens = store.history()
    assert store.delete_where("length > 999") == 0
    assert store.history() == gens  # no commit on zero matches
    # SQL-string predicates work too
    assert store.delete_where("name = 'd0.txt'") == 1
    assert _names(store) == ["d1.txt", "d2.txt"]


def F_len_ge_13():
    from pyspark.sql import functions as F

    return F.col("length") >= 13


def test_adts_roundtrip_and_sniff():
    """encode_adts → parse_adts recovers frame count, sample facts, and
    profile; the sniffer claims audio/aac only with two consecutive
    valid frames; MPEG-audio and ADTS headers are mutually rejecting."""
    from dmshadoop_spark.dms.extract import _sniff, extract_metadata
    from dmshadoop_spark.multimodal import encode_adts, encode_mp3, parse_adts
    from dmshadoop_spark.multimodal.containers import (
        _adts_frame_at,
        _mp3_frame_at,
    )

    d = encode_adts(8, 44100, 2, profile=1)
    m = parse_adts(d)
    assert m["n_frames"] == 8 and m["total_samples"] == 8 * 1024
    assert (m["sample_rate"], m["channels"], m["profile"]) == (44100, 2, "LC")
    assert _sniff(d) == "audio/aac"
    meta = extract_metadata(d)
    assert meta["content_type"] == "audio/aac"
    assert meta["frame_count"] == "8" and meta["profile"] == "LC"
    assert meta["duration_ms"] == str(8 * 1024 * 1000 // 44100)
    # disjointness: each walk rejects the other's frames
    assert _mp3_frame_at(d, 0) is None
    assert _adts_frame_at(encode_mp3(3), 0) is None
    assert _sniff(encode_mp3(3)) == "audio/mpeg"
    # a lone sync-looking pair of bytes must not claim aac
    assert _sniff(b"\xff\xf1hello world this is text") != "audio/aac"


@given(st.binary(max_size=160))
@settings(max_examples=150, deadline=None)
def test_adts_parser_never_crashes_on_junk(junk):
    """adts_frames raises only ValueError on junk; the sniffer never
    raises (the extraction UDF runs on arbitrary ingested bytes)."""
    from dmshadoop_spark.dms.extract import _sniff
    from dmshadoop_spark.multimodal import adts_frames

    _sniff(junk)
    _sniff(b"\xff\xf1" + junk)
    try:
        adts_frames(b"\xff\xf1" + junk)
    except ValueError:
        pass


def test_sample_frames_routes_adts_real(spark):
    """sample_frames emits REAL AAC ADTS frame payloads with container
    timestamps (real=true), like the MPEG-audio branch."""
    from dmshadoop_spark.multimodal import encode_adts, sample_frames

    aac = encode_adts(10, 48000, 2)
    df = spark.createDataFrame(
        [("aac://1", bytearray(aac))], "path string, content binary"
    )
    rows = sample_frames(df, every_s=0.0001).orderBy("frame_idx").collect()
    assert all(r["real"] for r in rows)
    assert rows[0]["frame_idx"] == 0 and abs(rows[0]["ts_sec"]) < 1e-9
    assert bytes(rows[0]["frame"]) == aac[:27]
    assert abs(rows[1]["ts_sec"] - 1024 / 48000) < 1e-9


def test_restore_rolls_forward_to_old_snapshot(store):
    """restore(gen) commits a NEW generation identical to the old one —
    a deleted key reads back, diff(old, restored) is empty, history
    keeps every intermediate state, and no data was copied (inode
    sharing with the restored generation)."""
    import os

    store.upload("a.txt", b"v1")
    store.upload("b.txt", b"v2")
    g_before = store.history()[-1]
    assert store.delete("a.txt")
    assert store.download("a.txt") is None
    g_new = store.restore(g_before)
    assert store.history()[-1] == g_new
    assert store.download("a.txt") == b"v1"
    assert store.diff(g_before, g_new).count() == 0
    # pure metadata: every data file inode-shared with the restored gen
    src = store._gen_path(g_before)
    dst = store._gen_path(g_new)
    src_inodes = {
        os.stat(os.path.join(src, f)).st_ino
        for f in os.listdir(src)
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(src, f))
    }
    for f in os.listdir(dst):
        if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(dst, f)):
            assert os.stat(os.path.join(dst, f)).st_ino in src_inodes
    with pytest.raises(ValueError):
        store.restore(99)


def test_staging_debris_swept_on_next_commit(store):
    """Round-11 advice (store.py): leftover .staging-* dirs from crashed
    commits must not accumulate — every commit path sweeps them first."""
    import os

    store.upload("a.txt", b"v1")
    debris = os.path.join(store.base_dir, ".staging-deadbeefcafe")
    os.makedirs(debris)
    with open(os.path.join(debris, "part-junk.parquet"), "wb") as f:
        f.write(b"\x00junk")
    store.upload("b.txt", b"v2")  # insert path sweeps
    assert not os.path.exists(debris)
    os.makedirs(debris)
    assert store.delete("a.txt")  # delete path sweeps too
    assert not os.path.exists(debris)
    os.makedirs(debris)
    store.compact()  # rewrite path sweeps too
    assert not os.path.exists(debris)
    assert store.download("b.txt") == b"v2"


def test_concurrent_commit_raises_instead_of_clobbering(store):
    """The single-writer contract is enforced: a writer holding a STALE
    view of the current generation loses the atomic rename-claim race
    and gets ConcurrentWriteError — the winner's generation is never
    interleaved with the loser's files, and the loser's staged commit
    survives for retry."""
    import os

    from dmshadoop_spark.dms.store import ConcurrentWriteError

    store.upload("a.txt", b"v1")  # gen=0
    store.upload("a.txt", b"v2")  # writer A wins gen=1
    gen1 = store._gen_path(1)
    before = sorted(os.listdir(gen1))
    # writer B interleaved: it read gen=0 before A committed, so it
    # stages its own commit and tries to publish the SAME generation
    staging = store._staging_dir()
    os.makedirs(staging)
    with open(os.path.join(staging, "part-b.parquet"), "wb") as f:
        f.write(b"\x00loser")
    with open(os.path.join(staging, "_SUCCESS"), "w"):
        pass
    with pytest.raises(ConcurrentWriteError):
        store._publish(staging, 1)
    assert sorted(os.listdir(gen1)) == before  # winner untouched
    assert os.path.exists(os.path.join(staging, "part-b.parquet"))  # retryable
    assert store.download("a.txt") == b"v2"


def test_delete_where_majority_multifile_tombstone_sidecar(spark, store):
    """Round-11 verdict task 4: a predicate matching the majority of keys
    writes its tombstone set through BOUNDED multiple part files (no
    single-task serialization, no per-scan-partition spray), and the
    read side merges them transparently."""
    import os

    from pyspark.sql import functions as F

    docs = (
        spark.range(40)
        .select(
            F.concat(F.lit("doc-"), F.col("id")).alias("name"),
            F.encode(
                F.concat(F.lit("body-"), F.col("id")), "UTF-8"
            ).alias("content"),
        )
        .repartition(8)
    )
    store.bulk_ingest(docs)
    n = store.delete_where(F.col("name") != "doc-0")
    assert n == 39
    tdir = store._tombstone_dir(store.history()[-1])
    parts = [
        f for f in os.listdir(tdir) if not f.startswith(("_", "."))
    ]
    assert 1 < len(parts) <= 16
    assert _names(store) == ["doc-0"]
    lay = store.layout()
    assert lay["tombstone_rows"] == 39
    assert lay["data_files"] == lay["data_files_shared_with_prev"] > 0


def test_id3_tagged_adts_sniffs_as_aac_with_metadata():
    """Round-11 advice (extract.py:81): an ID3v2-prefixed ADTS stream is
    audio/aac, not audio/mpeg — the sniffer peeks past the syncsafe tag
    size and applies the ADTS-vs-MPEG discrimination there, so tagged
    crawl audio keeps its AAC stream facts AND its ID3 text tags."""
    from dmshadoop_spark.dms.extract import _sniff, extract_metadata
    from dmshadoop_spark.multimodal import encode_adts, encode_mp3
    from dmshadoop_spark.multimodal.containers import encode_id3v2

    aac = encode_id3v2(
        encode_adts(8, 44100, 2, profile=1), title="Song", artist="Band"
    )
    assert _sniff(aac) == "audio/aac"
    meta = extract_metadata(aac)
    assert meta["content_type"] == "audio/aac"
    assert meta["frame_count"] == "8" and meta["profile"] == "LC"
    assert meta["id3_title"] == "Song" and meta["id3_artist"] == "Band"
    # ID3-tagged MPEG audio still routes to audio/mpeg
    mp3 = encode_id3v2(encode_mp3(3), title="Other")
    assert _sniff(mp3) == "audio/mpeg"
    assert extract_metadata(mp3)["id3_title"] == "Other"
    # a tag whose audio lies beyond the fetched prefix stays audio/mpeg
    assert _sniff(b"ID3" + bytes(20)) == "audio/mpeg"
    # truncated mid-tag: still the tagged-stream default, never a raise
    assert _sniff(encode_id3v2(b"", title="T")[:7]) == "audio/mpeg"


def test_vbr_header_reads_bounded_by_first_frame():
    """Round-11 advice (containers.py:178): Xing field reads must stop at
    the first frame's end — a truncated metadata frame followed by other
    bytes must not report values read from the NEXT frame's bytes."""
    from dmshadoop_spark.multimodal import encode_mp3_vbr, parse_vbr_header
    from dmshadoop_spark.multimodal.containers import mp3_frames

    data = encode_mp3_vbr([96, 128, 160], 44100)
    v = parse_vbr_header(data)
    assert v["frames"] == 3 and v["bytes"] == len(data)
    # craft a 32 kbps first frame (104 bytes): the Xing tag at offset 36
    # declares frames+bytes+TOC+quality, but 4+32+8+8+100 = 152 > 104, so
    # the TOC overruns the frame and the quality field lands INSIDE the
    # second frame's bytes — it must come back None, not frame-2 data
    from dmshadoop_spark.multimodal.containers import (
        _mp3_frame_shell,
        _xing_offset,
    )

    head = _mp3_frame_shell(32, 44100)
    p = _xing_offset(bytes(head), 0)
    head[p : p + 4] = b"Xing"
    head[p + 4 : p + 8] = (0xF).to_bytes(4, "big")  # all four fields
    head[p + 8 : p + 12] = (7).to_bytes(4, "big")   # frames
    head[p + 12 : p + 16] = (999).to_bytes(4, "big")  # bytes
    malformed = bytes(head) + encode_mp3_vbr([96], 44100)
    frames = mp3_frames(malformed)
    assert frames[0]["length"] == len(head)  # walk sees the short frame
    w = parse_vbr_header(malformed)
    assert w["frames"] == 7 and w["bytes"] == 999  # in-frame fields kept
    assert w["quality"] is None  # beyond the frame end: never misread
    assert w["encoder"] is None
