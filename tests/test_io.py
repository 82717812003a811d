"""Host I/O tests: BED/XML/FASTA/BigWig round-trips and symbol semantics
(SURVEY.md §4: trackTest / bedTrackTest analogues)."""

import textwrap

import numpy as np
import pytest

from tehmm_tpu.io import (
    BedInterval,
    CategoryMap,
    Track,
    TrackList,
    load_track_data,
    merge_adjacent_intervals,
    get_merged_bed_intervals,
    read_bed_intervals,
    write_bed_intervals,
)
from tehmm_tpu.io.bed import read_bed
from tehmm_tpu.io.fasta import FastaFile
from tehmm_tpu.io.bigwig import BigWigFile
from tehmm_tpu.io.bigwig_writer import write_bigwig


@pytest.fixture
def tmp_text(tmp_path):
    def write(name, content):
        p = tmp_path / name
        p.write_text(textwrap.dedent(content))
        return str(p)

    return write


class TestBed:
    def test_read_write_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.bed")
        ivs = [
            ("chr1", 0, 100, "LINE"),
            ("chr1", 100, 250, "SINE"),
            ("chr2", 5, 10, "LTR"),
        ]
        write_bed_intervals(ivs, path)
        assert read_bed_intervals(path, ncol=4) == ivs
        assert read_bed_intervals(path, ncol=3) == [t[:3] for t in ivs]

    def test_skips_headers_and_comments(self, tmp_text):
        path = tmp_text(
            "h.bed",
            """\
            # a comment
            track name=test
            browser position chr1
            chr1\t10\t20\tA
            """,
        )
        assert read_bed_intervals(path, ncol=4) == [("chr1", 10, 20, "A")]

    def test_merge_adjacent_same_name(self):
        merged = merge_adjacent_intervals(
            [
                ("chr1", 0, 10, "A"),
                ("chr1", 10, 20, "A"),
                ("chr1", 20, 30, "B"),
                ("chr2", 30, 40, "B"),
            ]
        )
        assert merged == [
            ("chr1", 0, 20, "A"),
            ("chr1", 20, 30, "B"),
            ("chr2", 30, 40, "B"),
        ]

    def test_get_merged_bed_intervals(self, tmp_path):
        path = str(tmp_path / "m.bed")
        write_bed_intervals(
            [
                ("chr1", 0, 10, "A"),
                ("chr1", 5, 20, "B"),
                ("chr1", 20, 30, "C"),
                ("chr1", 40, 50, "D"),
            ],
            path,
        )
        assert get_merged_bed_intervals(path) == [
            ("chr1", 0, 30),
            ("chr1", 40, 50),
        ]


class TestTrackXml:
    def test_parse_and_roundtrip(self, tmp_text, tmp_path):
        xml = tmp_text(
            "tracks.xml",
            """\
            <teModelConfig>
              <track name="rep" path="rep.bed" distribution="multinomial"/>
              <track name="cov" path="cov.bed" distribution="binary"/>
              <track name="num" path="num.bed" valCol="4" scale="2.0"
                     shift="-1.0" custom="keepme"/>
            </teModelConfig>
            """,
        )
        tl = TrackList(xml)
        assert len(tl) == 3
        assert tl[0].name == "rep" and tl[0].number == 0
        assert tl.get_track_by_name("cov").distribution == "binary"
        num = tl.get_track_by_name("num")
        assert num.val_col == 4 and num.scale == 2.0 and num.shift == -1.0
        assert num.extra_attrs == {"custom": "keepme"}

        out = str(tmp_path / "echo.xml")
        tl.save_xml(out)
        tl2 = TrackList(out)
        assert [t.name for t in tl2] == ["rep", "cov", "num"]
        assert tl2.get_track_by_name("num").extra_attrs == {
            "custom": "keepme"
        }

    def test_save_xml_rebases_relative_paths(self, tmp_path):
        """An XML saved into a DIFFERENT directory must re-relativize
        relative track paths against the new location — load_xml resolves
        them against the XML's own directory, so writing the original
        relative string verbatim dangles (observed: track-ranking's
        per-candidate sub-XMLs in outDir).  Same-directory saves keep the
        bare name byte-identically; absolute paths pass through."""
        import os

        src = tmp_path / "src"
        src.mkdir()
        (src / "rep.bed").write_text("chr1\t0\t10\tX\n")
        xml = src / "tracks.xml"
        xml.write_text(
            '<teModelConfig><track name="rep" path="rep.bed"/>'
            f'<track name="abs" path="{src}/rep.bed"/></teModelConfig>'
        )
        tl = TrackList(str(xml))

        # same-directory save: relative path survives verbatim
        tl.save_xml(str(src / "echo.xml"))
        assert 'path="rep.bed"' in (src / "echo.xml").read_text()

        # cross-directory save: path rewrites (absolute) and still
        # resolves to the same file
        sub = tmp_path / "out"
        sub.mkdir()
        tl.save_xml(str(sub / "sub.xml"))
        tl2 = TrackList(str(sub / "sub.xml"))
        assert os.path.exists(tl2.get_track_by_name("rep").path)
        assert os.path.normpath(
            tl2.get_track_by_name("rep").path
        ) == str(src / "rep.bed")
        assert tl2.get_track_by_name("abs").orig_path == f"{src}/rep.bed"

    def test_sidecar_roundtrip(self):
        tl = TrackList()
        tl.add(Track(name="a", path="a.bed"))
        tl.add(Track(name="b", path="b.fa", distribution="sparse"))
        tl2 = TrackList.from_dicts(tl.to_dicts())
        assert [t.name for t in tl2] == ["a", "b"]
        assert tl2[1].distribution == "sparse"

    def test_duplicate_name_rejected(self):
        tl = TrackList()
        tl.add(Track(name="a", path="a.bed"))
        with pytest.raises(ValueError, match="duplicate"):
            tl.add(Track(name="a", path="b.bed"))


class TestCategoryMap:
    def test_assign_and_lookup(self):
        cm = CategoryMap()
        assert cm.get_map("LINE", update=True) == 1
        assert cm.get_map("SINE", update=True) == 2
        assert cm.get_map("LINE") == 1
        assert cm.get_map("unknown") == cm.missing == 0
        assert len(cm) == 3
        assert cm.get_back_map(2) == "SINE"

    def test_serialization_roundtrip(self):
        cm = CategoryMap()
        cm.get_map("x", update=True)
        cm.get_map("y", update=True)
        cm2 = CategoryMap.from_dict(cm.to_dict())
        assert cm2.get_map("y") == 2
        assert cm2.get_map("z") == 0
        assert len(cm2) == len(cm)


class TestFasta:
    def test_fetch(self, tmp_text):
        path = tmp_text(
            "g.fa",
            """\
            >chr1 description text
            ACGTACGTAC
            GTACGTACGT
            >chr2
            NNNNACGT
            """,
        )
        fa = FastaFile(path)
        assert fa.names == ["chr1", "chr2"]
        assert fa.length("chr1") == 20
        assert fa.fetch("chr1", 0, 10) == "ACGTACGTAC"
        assert fa.fetch("chr1", 8, 12) == "ACGT"  # crosses line break
        assert fa.fetch("chr2", 2, 6) == "NNAC"
        assert fa.fetch("chr1", 18, 25) == "GT"  # clipped at end

    def test_short_last_line_ok(self, tmp_text):
        path = tmp_text(
            "ok.fa",
            """\
            >chr1
            ACGTACGTAC
            GTAC
            """,
        )
        fa = FastaFile(path)
        assert fa.length("chr1") == 14
        assert fa.fetch("chr1", 8, 14) == "ACGTAC"

    def test_ragged_interior_lines_rejected(self, tmp_text):
        """Ragged interior line lengths would make fetch() return WRONG
        bases silently (the offset math assumes faidx-style fixed-width
        lines) — indexing must raise instead."""
        import pytest

        short_interior = tmp_text(
            "bad1.fa",
            """\
            >chr1
            ACGTACGTAC
            GTAC
            ACGTACGTAC
            """,
        )
        with pytest.raises(ValueError, match="ragged"):
            FastaFile(short_interior)
        long_interior = tmp_text(
            "bad2.fa",
            """\
            >chr1
            ACGT
            ACGTACGTAC
            """,
        )
        with pytest.raises(ValueError, match="ragged"):
            FastaFile(long_interior)


class TestBigWig:
    def test_write_read_roundtrip(self, tmp_path):
        path = str(tmp_path / "x.bw")
        entries = [
            ("chr1", 0, 10, 1.5),
            ("chr1", 10, 20, 2.5),
            ("chr1", 30, 35, -1.0),
            ("chr2", 0, 5, 7.0),
        ]
        write_bigwig(path, {"chr1": 100, "chr2": 50}, entries)
        with BigWigFile(path) as bw:
            assert set(bw.chroms) == {"chr1", "chr2"}
            vals = bw.values("chr1", 0, 40)
            assert np.all(vals[0:10] == 1.5)
            assert np.all(vals[10:20] == 2.5)
            assert np.all(np.isnan(vals[20:30]))
            assert np.all(vals[30:35] == -1.0)
            assert np.all(np.isnan(vals[35:40]))
            assert bw.values("chr2", 0, 5).tolist() == [7.0] * 5
            assert np.all(np.isnan(bw.values("chrMissing", 0, 5)))
            assert bw.intervals("chr1", 0, 40) == [
                (0, 10, 1.5), (10, 20, 2.5), (30, 35, -1.0)
            ]

    def test_uncompressed(self, tmp_path):
        path = str(tmp_path / "u.bw")
        write_bigwig(
            path, {"c": 10}, [("c", 0, 10, 3.0)], compress=False
        )
        with BigWigFile(path) as bw:
            assert np.all(bw.values("c", 0, 10) == 3.0)

    def test_many_sections(self, tmp_path):
        """> 256 sections exercises the two-level R-tree."""
        path = str(tmp_path / "big.bw")
        entries = []
        # 1024 items per section; force many sections via many chroms
        sizes = {}
        for c in range(300):
            name = f"c{c:03d}"
            sizes[name] = 2000
            entries.append((name, 0, 1000, float(c)))
        write_bigwig(path, sizes, entries)
        with BigWigFile(path) as bw:
            assert np.all(bw.values("c123", 0, 1000) == 123.0)
            assert np.all(bw.values("c299", 500, 900) == 299.0)


class TestTrackData:
    def _fixtures(self, tmp_path):
        rep = str(tmp_path / "rep.bed")
        write_bed_intervals(
            [("chr1", 0, 50, "LINE"), ("chr1", 80, 120, "SINE")], rep
        )
        cov = str(tmp_path / "cov.bed")
        write_bed_intervals([("chr1", 20, 60, "x")], cov)
        fa = tmp_path / "g.fa"
        fa.write_text(">chr1\n" + "ACGT" * 50 + "\n")
        tl = TrackList()
        tl.add(Track(name="rep", path=rep))
        tl.add(Track(name="cov", path=cov, distribution="binary"))
        tl.add(Track(name="seq", path=str(fa)))
        return tl

    def test_symbols_and_semantics(self, tmp_path):
        tl = self._fixtures(tmp_path)
        td = load_track_data(tl, [("chr1", 0, 100)])
        (tab,) = td.tables
        assert tab.symbols.shape == (100, 3)
        rep_cm = td.category_maps["rep"]
        line = rep_cm.get_map("LINE")
        sine = rep_cm.get_map("SINE")
        assert line != 0 and sine != 0 and line != sine
        assert np.all(tab.symbols[0:50, 0] == line)
        assert np.all(tab.symbols[50:80, 0] == 0)  # uncovered -> missing
        assert np.all(tab.symbols[80:100, 0] == sine)
        cov_cm = td.category_maps["cov"]
        on, off = cov_cm.get_map("1"), cov_cm.get_map("0")
        assert np.all(tab.symbols[20:60, 1] == on)
        assert np.all(tab.symbols[0:20, 1] == off)
        seq_cm = td.category_maps["seq"]
        a = seq_cm.get_map("A")
        assert tab.symbols[0, 2] == a
        assert tab.symbols[4, 2] == a

    def test_eval_mode_reuses_maps(self, tmp_path):
        tl = self._fixtures(tmp_path)
        td_train = load_track_data(tl, [("chr1", 0, 100)])
        # eval over a region containing a NEW value -> must map to missing,
        # not a fresh symbol (SURVEY.md §3.2: maps come from the model)
        extra = str(tmp_path / "rep2.bed")
        write_bed_intervals([("chr1", 0, 30, "NOVEL")], extra)
        tl2 = self._fixtures(tmp_path)
        tl2.get_track_by_name("rep").path = extra
        td_eval = load_track_data(
            tl2, [("chr1", 0, 100)],
            category_maps=td_train.category_maps,
        )
        (tab,) = td_eval.tables
        assert np.all(tab.symbols[0:30, 0] == 0)
        assert len(td_eval.category_maps["rep"]) == len(
            td_train.category_maps["rep"]
        )

    def test_alphabet_sizes(self, tmp_path):
        tl = self._fixtures(tmp_path)
        td = load_track_data(tl, [("chr1", 0, 100)])
        sizes = td.alphabet_sizes
        assert sizes[0] == 3  # missing + LINE + SINE
        assert sizes[1] == 3  # missing + "0" + "1"
        assert sizes[2] == 5  # missing + ACGT

    def test_bigwig_track(self, tmp_path):
        bw_path = str(tmp_path / "sig.bw")
        write_bigwig(
            bw_path, {"chr1": 1000},
            [("chr1", 0, 10, 1.0), ("chr1", 10, 20, 5.0)],
        )
        tl = TrackList()
        tl.add(Track(name="sig", path=bw_path, scale=1.0))
        td = load_track_data(tl, [("chr1", 0, 30)])
        (tab,) = td.tables
        cm = td.category_maps["sig"]
        assert np.all(tab.symbols[0:10, 0] == cm.get_map(1))
        assert np.all(tab.symbols[10:20, 0] == cm.get_map(5))
        assert np.all(tab.symbols[20:30, 0] == 0)  # NaN -> missing

    def test_bigwig_vectorized_binning_matches_bin_value(self, tmp_path):
        """The vectorized integer-bin LUT fast path for scale/logScale
        BigWig tracks must reproduce io.category.bin_value exactly —
        including negative values, shift, and floor at bin edges."""
        from tehmm_tpu.io.category import bin_value

        rng = np.random.RandomState(3)
        vals = np.round(rng.uniform(-5, 5, size=200), 3)
        vals[::7] = np.arange(len(vals[::7]))  # exact integers too
        entries = [
            ("chr1", i, i + 1, float(v)) for i, v in enumerate(vals)
        ]
        for kwargs in (
            dict(scale=2.0, shift=-1.0),
            dict(scale=0.5),
            dict(log_scale=2.0, shift=6.0),  # shift keeps v positive
        ):
            bw_path = str(tmp_path / "v.bw")
            write_bigwig(bw_path, {"chr1": len(vals)}, entries)
            tl = TrackList()
            tl.add(Track(name="v", path=bw_path, **kwargs))
            td = load_track_data(tl, [("chr1", 0, len(vals))])
            (tab,) = td.tables
            cm = td.category_maps["v"]
            expect = np.asarray([
                cm.get_map(bin_value(
                    float(np.float32(v)),
                    scale=kwargs.get("scale"),
                    log_scale=kwargs.get("log_scale"),
                    shift=kwargs.get("shift"),
                ))
                for v in vals
            ])
            np.testing.assert_array_equal(
                tab.symbols[:, 0], expect, err_msg=str(kwargs)
            )
            assert not np.any(tab.symbols[:, 0] == 0)  # all covered


class TestBigWigSpecFixture:
    """Read a BigWig assembled BYTE-BY-BYTE from the kent bbiFile spec
    field tables, independently of io/bigwig_writer.py (round-1 review:
    the reader was only round-trip-tested against its own writer, so a
    shared spec misreading would self-confirm).  Exercises all three
    WIG section types, an internal (two-level) R-tree, and uncompressed
    sections — none of which the writer produces the same way."""

    def _build(self, path):
        import struct

        def sec(chrom_id, start, end, step, span, wtype, body,
                count):
            return struct.pack(
                "<IIIIIBBH", chrom_id, start, end, step, span,
                wtype, 0, count,
            ) + body

        # --- data sections (uncompressed) ---
        fixed = sec(
            0, 100, 130, 10, 10, 3,
            struct.pack("<3f", 1.5, 2.5, 3.5), 3,
        )  # [100,110)=1.5 [110,120)=2.5 [120,130)=3.5
        varstep = sec(
            0, 200, 230, 0, 5, 2,
            struct.pack("<IfIf", 200, 7.0, 225, 8.0), 2,
        )  # [200,205)=7 [225,230)=8
        bedgraph = sec(
            0, 300, 320, 0, 0, 1,
            struct.pack("<IIf", 300, 320, -4.25), 1,
        )

        header_sz = 64
        # layout: header | chrom tree | data | rtree
        chrom_tree_off = header_sz
        key_size = 4
        chrom_tree = struct.pack(
            "<IIIIQQ", 0x78CA8C91, 1, key_size, 8, 1, 0
        ) + struct.pack("<BBH", 1, 0, 1) \
          + b"chr1" + struct.pack("<II", 0, 1000)
        data_off = chrom_tree_off + len(chrom_tree)
        off_fixed = data_off
        off_var = off_fixed + len(fixed)
        off_bg = off_var + len(varstep)
        rtree_off = off_bg + len(bedgraph)

        # two leaves under one internal root (exercise internal nodes)
        # node headers are 4 bytes; leaf items 32, internal items 24
        root_off = rtree_off + 48
        leaf1_off = root_off + 4 + 2 * 24
        leaf2_off = leaf1_off + 4 + 2 * 32
        rtree = struct.pack(
            "<IIQIIIIQII", 0x2468ACE0, 256, 3, 0, 100, 0, 320,
            rtree_off, 64, 0,
        )
        rtree += struct.pack("<BBH", 0, 0, 2)
        rtree += struct.pack("<IIIIQ", 0, 100, 0, 230, leaf1_off)
        rtree += struct.pack("<IIIIQ", 0, 300, 0, 320, leaf2_off)
        rtree += struct.pack("<BBH", 1, 0, 2)
        rtree += struct.pack(
            "<IIIIQQ", 0, 100, 0, 130, off_fixed, len(fixed)
        )
        rtree += struct.pack(
            "<IIIIQQ", 0, 200, 0, 230, off_var, len(varstep)
        )
        rtree += struct.pack("<BBH", 1, 0, 1)
        rtree += struct.pack(
            "<IIIIQQ", 0, 300, 0, 320, off_bg, len(bedgraph)
        )

        header = struct.pack(
            "<IHHQQQHHQQIQ",
            0x888FFC26,      # magic
            4,               # version
            0,               # zoomLevels
            chrom_tree_off,
            data_off,
            rtree_off,
            0, 0,            # fieldCount, definedFieldCount
            0, 0,            # autoSql, totalSummary
            0,               # uncompressBufSize == 0 -> no zlib
            0,               # reserved
        )
        with open(path, "wb") as fh:
            fh.write(header)
            fh.write(chrom_tree)
            fh.write(fixed)
            fh.write(varstep)
            fh.write(bedgraph)
            fh.write(rtree)

    def test_spec_fixture_values(self, tmp_path):
        from tehmm_tpu.io.bigwig import BigWigFile

        path = str(tmp_path / "spec.bw")
        self._build(path)
        with BigWigFile(path) as bw:
            assert bw.chroms["chr1"] == (0, 1000)
            v = bw.values("chr1", 95, 135)
            assert np.isnan(v[:5]).all() and np.isnan(v[-5:]).all()
            np.testing.assert_array_equal(v[5:15], 1.5)
            np.testing.assert_array_equal(v[15:25], 2.5)
            np.testing.assert_array_equal(v[25:35], 3.5)
            v = bw.values("chr1", 195, 235)
            np.testing.assert_array_equal(v[5:10], 7.0)
            assert np.isnan(v[10:30]).all()
            np.testing.assert_array_equal(v[30:35], 8.0)
            v = bw.values("chr1", 300, 320)
            np.testing.assert_array_equal(v, -4.25)
            # query slicing inside a section
            np.testing.assert_array_equal(
                bw.values("chr1", 115, 118), 2.5
            )
            # untouched region + unknown chrom
            assert np.isnan(bw.values("chr1", 0, 50)).all()
            assert np.isnan(bw.values("chrX", 0, 10)).all()


    def test_native_paint_matches_python(self, tmp_path, monkeypatch):
        """The native C++ section decoder (round-3: zlib inflate +
        paint in one call) must agree bit-for-bit with the pure-Python
        per-block path on every WIG section type, compressed and
        uncompressed, including NaN gaps."""
        import pytest

        from tehmm_tpu import native
        from tehmm_tpu.io.bigwig import BigWigFile

        if not native.available():
            pytest.skip("native library unavailable")

        spec = str(tmp_path / "spec.bw")     # uncompressed, all types
        self._build(spec)
        comp = str(tmp_path / "comp.bw")     # compressed bedGraph
        rng = np.random.RandomState(3)
        entries = []
        pos = 0
        for _ in range(4000):
            pos += int(rng.randint(1, 4))
            entries.append(
                ("chr1", pos, pos + int(rng.randint(1, 3)),
                 float(rng.randn()))
            )
            pos = entries[-1][2]
        write_bigwig(comp, {"chr1": pos + 10}, entries)

        queries = [
            (spec, "chr1", 0, 1000), (spec, "chr1", 95, 135),
            (comp, "chr1", 0, pos + 10), (comp, "chr1", 37, 911),
        ]
        got_native, got_python = [], []
        for path, c, s, e in queries:
            with BigWigFile(path) as bw:
                got_native.append(bw.values(c, s, e))
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        for path, c, s, e in queries:
            with BigWigFile(path) as bw:
                got_python.append(bw.values(c, s, e))
        for a, b in zip(got_native, got_python):
            np.testing.assert_array_equal(a, b)


class TestReviewRegressions:
    """Round-2 I/O review fixes."""

    def test_bed_contig_named_like_header(self, tmp_path):
        """A record on a contig named 'track_15' is data, not a UCSC
        header — only the bare keyword (or keyword + settings) is."""
        from tehmm_tpu.io.bed import read_bed

        p = tmp_path / "t.bed"
        p.write_text(
            'track name="x" description="header"\n'
            "browser position chr1\n"
            "track_15\t0\t10\tA\n"
            "browser_region\t5\t9\tB\n"
        )
        ivs = read_bed(str(p))
        assert [iv.chrom for iv in ivs] == ["track_15", "browser_region"]

    def test_binary_bigwig_track_two_symbols(self, tmp_path):
        """distribution='binary' on a BigWig: covered := '1' regardless
        of the float values (the docstring's two-symbol contract)."""
        bw_path = str(tmp_path / "b.bw")
        write_bigwig(
            bw_path, {"chr1": 100},
            [("chr1", 0, 10, 1.25), ("chr1", 10, 20, 7.5)],
        )
        tl = TrackList()
        tl.add(Track(name="b", path=bw_path, distribution="binary"))
        td = load_track_data(tl, [("chr1", 0, 30)])
        (tab,) = td.tables
        cm = td.category_maps["b"]
        assert len(cm) == 3  # missing + "0" + "1"
        one = cm.get_map("1")
        assert np.all(tab.symbols[0:20, 0] == one)
        assert np.all(tab.symbols[20:30, 0] != one)

    def test_zero_length_segments_dropped(self, tmp_path):
        """Zero-length segment records are dropped with a warning
        instead of corrupting the chain offset math."""
        from tehmm_tpu.io.segments import load_segment_data

        bed = tmp_path / "t.bed"
        bed.write_text("chr1\t0\t50\tx\n")
        tl = TrackList()
        tl.add(Track(name="t", path=str(bed), distribution="binary"))
        segs = [
            ("chr1", 0, 20), ("chr1", 20, 20), ("chr1", 20, 50),
            ("chr1", 50, 50),
        ]
        _td, tables = load_segment_data(tl, segs)
        assert len(tables) == 1
        assert len(tables[0]) == 2
        assert list(tables[0].lengths) == [20, 30]


class TestFastaHeaderEdgeCases:
    def test_empty_record_name_raises_both_paths(self, tmp_path):
        """A '>' header with no name must raise a clear ValueError in
        BOTH the native scanner and the Python fallback (round-3
        review: the native name join misaligned every name after an
        empty one; Python raised a bare IndexError)."""
        import pytest

        from tehmm_tpu import native
        from tehmm_tpu.io.fasta import FastaFile

        for header in (">", ">  "):
            p = tmp_path / "bad.fa"
            p.write_text(f"{header}\nACGT\n>chr1\nACGT\n")
            with pytest.raises(ValueError, match="empty record name"):
                FastaFile(str(p))
            (tmp_path / "bad.fa.fai").unlink(missing_ok=True)
            p.unlink()

    def test_header_with_leading_blank_matches_python(
        self, tmp_path, monkeypatch
    ):
        """'> name desc' parses the first token after the blanks, the
        same way Python's line[1:].split()[0] does."""
        import pytest

        from tehmm_tpu import native
        from tehmm_tpu.io.fasta import FastaFile

        p = tmp_path / "sp.fa"
        p.write_text("> chrA some desc\nACGTAC\n>chrB\nTTTT\n")
        fa = FastaFile(str(p))
        assert fa.names == ["chrA", "chrB"]
        assert fa.fetch("chrA", 0, 6) == "ACGTAC"
        assert fa.fetch("chrB", 0, 4) == "TTTT"
        if native.available():
            (tmp_path / "sp.fa.fai").unlink()
            monkeypatch.setattr(native, "_lib", None)
            monkeypatch.setattr(native, "_tried", True)
            fa_py = FastaFile(str(p))
            assert fa_py._index == fa._index


class TestLoadParallelAndPack:
    """Round-5: threaded per-track painting + native column packing
    (load_track_data; native.pack_columns).  The assembled tables must
    be identical regardless of worker count or native availability."""

    def _fixtures(self, tmp_path, rng):
        import numpy as _np

        L = 4000
        rep = str(tmp_path / "rep.bed")
        rows = []
        p = 0
        while p < L - 20:
            ln = int(rng.randint(5, 60))
            if rng.rand() < 0.5:
                rows.append(
                    ("chr1", p, p + ln, "LINE" if rng.rand() < 0.5
                     else "SINE")
                )
            p += ln
        write_bed_intervals(rows, rep)
        fa = tmp_path / "g.fa"
        seq = "".join(rng.choice(list("ACGT"), L))
        fa.write_text(">chr1\n" + seq + "\n")
        gbed = str(tmp_path / "gv.bed")
        write_bed_intervals(
            [("chr1", i, i + 10, f"{rng.randn():.3f}")
             for i in range(0, L - 10, 25)], gbed
        )
        tl = TrackList()
        tl.add(Track(name="rep", path=rep))
        tl.add(Track(name="cov", path=rep, distribution="binary"))
        tl.add(Track(name="seq", path=str(fa)))
        tl.add(Track(name="gv", path=gbed, distribution="gaussian"))
        return tl

    def test_threaded_load_matches_serial(self, tmp_path, monkeypatch):
        rng = np.random.RandomState(7)
        tl = self._fixtures(tmp_path, rng)
        ivs = [("chr1", 0, 4000), ("chr1", 100, 300)]
        monkeypatch.setenv("TEHMM_LOAD_THREADS", "1")
        td1 = load_track_data(tl, ivs)
        monkeypatch.setenv("TEHMM_LOAD_THREADS", "4")
        td4 = load_track_data(tl, ivs)
        for a, b in zip(td1.tables, td4.tables):
            np.testing.assert_array_equal(a.symbols, b.symbols)
            np.testing.assert_array_equal(a.values, b.values)
        for name in td1.category_maps:
            assert (td1.category_maps[name].to_dict()
                    == td4.category_maps[name].to_dict())

    def test_pack_columns_matches_numpy(self):
        from tehmm_tpu import native

        if not native.available():
            import pytest as _pytest

            _pytest.skip("native lib unavailable")
        rng = np.random.RandomState(0)
        L, T = 10000, 5
        cols = [
            rng.randint(0, 500, L).astype(np.uint16) for _ in range(T)
        ]
        out = np.empty((L, T), np.uint16)
        assert native.pack_columns(cols, out)
        np.testing.assert_array_equal(out, np.stack(cols, axis=1))
        fcols = [rng.randn(L).astype(np.float32) for _ in range(3)]
        fout = np.empty((L, 3), np.float32)
        assert native.pack_columns(fcols, fout)
        np.testing.assert_array_equal(fout, np.stack(fcols, axis=1))
        # unsupported dtype / shape mismatch -> caller must fall back
        assert not native.pack_columns(
            cols, np.empty((L, T), np.int64)
        )
        assert not native.pack_columns(
            cols[:-1], np.empty((L, T), np.uint16)
        )

    def test_no_native_fallback_load(self, tmp_path, monkeypatch):
        rng = np.random.RandomState(7)
        tl = self._fixtures(tmp_path, rng)
        td_native = load_track_data(tl, [("chr1", 0, 4000)])
        import tehmm_tpu.native as native_mod

        monkeypatch.setattr(native_mod, "pack_columns",
                            lambda cols, out, n_threads=0: False)
        td_fb = load_track_data(tl, [("chr1", 0, 4000)])
        np.testing.assert_array_equal(
            td_native.tables[0].symbols, td_fb.tables[0].symbols
        )
        np.testing.assert_array_equal(
            td_native.tables[0].values, td_fb.tables[0].values
        )
