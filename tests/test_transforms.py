"""Golden-behavior tests for the vendor transforms (FIXTURES.md F1-F4):
the source-specific semantics that aren't ANSI-SQL-expressible end-to-end
(SURVEY.md §5)."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from tests.fixtures import (
    amp_event_rows,
    csv_text,
    ga_session_rows,
    mp_engage_page,
    mp_export_lines,
)
from tomixpanel_spark.schemas import AMP_EVENT_SCHEMA, GA_SESSION_SCHEMA
from tomixpanel_spark.session import ensure_semantics


def _amp_df(spark, rows=None):
    ensure_semantics(spark)
    return spark.createDataFrame(rows or amp_event_rows(), AMP_EVENT_SCHEMA)


class TestAmplitude:
    def test_events_identity_and_time(self, spark):
        from tomixpanel_spark.transforms.amplitude import amp_events

        rows = amp_event_rows()
        out = {r["insert_id"]: r for r in amp_events(_amp_df(spark, rows)).collect()}
        assert len(out) == len(rows)
        by_src = {r["$insert_id"]: r for r in rows if r["$insert_id"]}
        for ins, src in by_src.items():
            got = out[ins]
            expect_id = src["user_id"] or src["device_id"] or str(src["amplitude_id"])
            assert got["distinct_id"] == expect_id
            assert got["event"] == src["event_type"]
            # dayjs.utc(event_time).valueOf() parity
            import datetime as dt

            t = dt.datetime.strptime(
                src["event_time"], "%Y-%m-%d %H:%M:%S.%f"
            ).replace(tzinfo=dt.timezone.utc)
            assert got["time_ms"] == int(t.timestamp() * 1000)

    def test_props_precedence_spread_order(self, spark):
        """user_properties beat groups beat event_properties; reserved beat
        all custom; pair table last (amplitudeToMixpanel.js:138,148-157)."""
        from tomixpanel_spark.transforms.amplitude import amp_events

        rows = amp_event_rows()
        out = amp_events(_amp_df(spark, rows)).collect()
        for got, src in zip(out, rows):
            props = got["props"]
            if src["user_properties"]:
                assert props["plan"] == "user-plan"  # user beats event_properties
            else:
                assert props["plan"] == src["event_properties"]["plan"]
            if src["os_name"]:
                assert props["$os"] == src["os_name"]
                assert props["$browser"] == src["os_name"]
            assert props["$source"] == "amplitudeToMixpanel (by AK)"
            # leftover amp scalar rides along at lowest precedence
            assert props["amplitude_id"] == str(src["amplitude_id"])

    def test_insert_id_kept_or_derived_deterministically(self, spark):
        from tomixpanel_spark.transforms.amplitude import amp_events

        rows = amp_event_rows()
        a = amp_events(_amp_df(spark, rows)).collect()
        b = amp_events(_amp_df(spark, rows)).collect()
        assert [r["insert_id"] for r in a] == [r["insert_id"] for r in b]
        kept = [r for r, s in zip(a, rows) if s["$insert_id"]]
        assert all(r["insert_id"].startswith("src-insert-") for r in kept)

    def test_profiles_only_nonempty_user_props(self, spark):
        from tomixpanel_spark.transforms.amplitude import amp_profiles

        rows = amp_event_rows()
        got = amp_profiles(_amp_df(spark, rows), token="tok").collect()
        assert len(got) == sum(1 for r in rows if r["user_properties"])
        for p in got:
            assert p["token"] == "tok"
            assert p["set"]["tier"] == "gold"

    def test_merges_deduped_pairs(self, spark):
        from tomixpanel_spark.transforms.amplitude import amp_merges

        rows = amp_event_rows()
        got = amp_merges(_amp_df(spark, rows), run_time_ms=123).collect()
        expect = {
            (r["user_id"], r["device_id"])
            for r in rows
            if r["user_id"] and r["device_id"]
        }
        assert {(r["id_a"], r["id_b"]) for r in got} == expect
        assert len(got) == len(expect)  # deduped (reference :271)
        assert all(r["time_ms"] == 123 for r in got)


class TestGA:
    def _df(self, spark):
        ensure_semantics(spark)
        return spark.createDataFrame(ga_session_rows(), GA_SESSION_SCHEMA)

    def test_session_boundaries_and_hit_times(self, spark):
        from tomixpanel_spark.transforms.ga import ga_events

        out = ga_events(self._df(spark)).collect()
        rows = ga_session_rows()
        assert sum(1 for r in out if r["event"] == "session begins") == len(rows)
        assert sum(1 for r in out if r["event"] == "session ends") == len(rows)
        n_hits = sum(len(s["hits"]) for s in rows)
        assert len(out) == 2 * len(rows) + n_hits
        by_user = {}
        for r in out:
            by_user.setdefault(r["distinct_id"], []).append(r)
        s0 = rows[0]
        start = int(s0["visitStartTime"]) * 1000
        mine = [
            r
            for r in out
            if r["time_ms"] in range(start, start + 10_000)
        ]
        begins = [r for r in mine if r["event"] == "session begins"][0]
        ends = [r for r in mine if r["event"] == "session ends"][0]
        assert begins["time_ms"] == start
        # single hit at offset 0 -> bumped to +1000; ends at last hit +1000
        assert ends["time_ms"] == start + 2000

    def test_event_name_resolution_chain(self, spark):
        from tomixpanel_spark.transforms.ga import ga_events

        out = ga_events(self._df(spark)).collect()
        names = {r["event"] for r in out}
        # h==0 hits have no eventInfo -> hit.type; 'na'/'' actions -> category
        assert "PAGE" in names
        assert "ecommerce" in names
        assert "add to cart" in names

    def test_full_inventory_fields_read_and_pass_through(self, spark):
        """gaSchema.json fields the transform does NOT consume (appInfo,
        contentGroup, eCommerceAction, pagePathLevels, device/geo extras)
        must READ cleanly — validated-then-ignored, not a read error — and
        must not leak into the emitted props."""
        from tomixpanel_spark.transforms.ga import ga_events

        rows = ga_session_rows()
        s = rows[0]
        s["totals"]["newVisits"] = "1"
        s["device"].update(flashVersion="11", screenColors="24-bit",
                           mobileDeviceMarketingName="X", mobileInputSelector="touch")
        s["geoNetwork"].update(cityId="123", networkDomain="ex.net",
                               networkLocation="somewhere")
        h = s["hits"][0]
        h["appInfo"] = {"screenName": "Home", "landingScreenName": "Home",
                        "exitScreenName": "Cart", "screenDepth": "3"}
        h["contentGroup"] = {"contentGroup1": "news"}
        h["eCommerceAction"] = {"action_type": "2", "step": "1"}
        h["exceptionInfo"] = {"isFatal": False}
        h["experiment"] = [{"experimentId": "e1"}]
        h["publisher_infos"] = [{"dfpClickId": "c1"}]
        if h.get("page"):
            h["page"]["pagePathLevel1"] = "/a"
        df = spark.createDataFrame(rows, GA_SESSION_SCHEMA)
        out = ga_events(df).collect()
        assert len(out) == 2 * len(rows) + sum(len(x["hits"]) for x in rows)
        for r in out:
            for k in r["props"]:
                assert not k.startswith(("contentGroup", "appInfo", "pagePathLevel"))

    def test_custom_dimensions_naming_and_na_skip(self, spark):
        from tomixpanel_spark.transforms.ga import ga_events

        out = ga_events(self._df(spark)).collect()
        hits = [r for r in out if r["event"] not in ("session begins", "session ends")]
        some = [r for r in hits if "dimension #4 (" + r["event"] + ")" in r["props"]]
        assert some, "expected dimension #4 keys"
        for r in hits:
            for k, v in r["props"].items():
                if k.startswith("dimension #"):
                    assert v not in ("na", "")

    def test_default_props_and_profile_hoist(self, spark):
        from tomixpanel_spark.transforms.ga import ga_events, ga_profiles

        ev = ga_events(self._df(spark)).collect()
        for r in ev:
            assert r["props"]["$browser"] == "Chrome"
            assert r["props"]["mp_country_code"] == "United States"
            assert r["props"]["UTM Channel"] == "Organic Search"
            # screenResolution overwrites browserSize on the same mp key
            assert r["props"]["screen size"] == "1920x1080"
        prof = ga_profiles(self._df(spark), token="t").collect()
        rows = ga_session_rows()
        for p, s in zip(prof, rows):
            if s["geoNetwork"]["latitude"] and s["geoNetwork"]["longitude"]:
                assert p["latitude"] == "37.77" and p["longitude"] == "-122.41"
            else:
                assert p["latitude"] is None

    def test_move_to_present_true_max_anchor(self, spark):
        from tomixpanel_spark.transforms.ga import FOUR_DAYS_MS, ga_events

        anchor = 1_800_000_000_000
        out = ga_events(self._df(spark), move_to_present=True, anchor_now_ms=anchor)
        mx = out.agg(F.max("time_ms")).collect()[0][0]
        assert mx == anchor - FOUR_DAYS_MS

    def test_insert_id_unique_per_event(self, spark):
        from tomixpanel_spark.transforms.ga import ga_events

        out = ga_events(self._df(spark))
        assert out.count() == out.select("insert_id").distinct().count()


class TestCsv:
    def _df(self, spark, tmp_path, **kw):
        from tomixpanel_spark.sources.csv import read_csv_all_strings

        p = tmp_path / "events.csv"
        p.write_text(csv_text(**kw))
        return read_csv_all_strings(spark, str(p))

    def test_time_heuristic_all_formats_equal(self, spark, tmp_path):
        from tomixpanel_spark.transforms.csv import CsvMapping, csv_events

        m = CsvMapping("action", "guid", "time", "insert_id", ["favoriteColor"])
        out = csv_events(self._df(spark, tmp_path), m).collect()
        # rows 0..2 use s/ms/datetime forms of adjacent instants
        assert out[0]["time_ms"] == 1_600_000_000 * 1000
        assert out[1]["time_ms"] == 1_600_000_001 * 1000
        # row 2: "2020-09-13 12:02:20" UTC parsed as datetime string
        assert out[2]["time_ms"] == 1_599_998_540 * 1000

    def test_ignore_cols_and_tags(self, spark, tmp_path):
        from tomixpanel_spark.transforms.csv import CsvMapping, csv_events

        m = CsvMapping(
            "action", "guid", "time", "insert_id", ["favoriteColor"], import_tag="batch-9"
        )
        out = csv_events(self._df(spark, tmp_path), m).collect()
        for r in out:
            assert "favoriteColor" not in r["props"]
            assert r["props"]["$source"] == "csvToMixpanel (by AK)"
            assert r["props"]["import-tag"] == "batch-9"
            assert r["props"]["plan"] in ("free", "pro")

    def test_insert_id_fallback_when_blank(self, spark, tmp_path):
        from tomixpanel_spark.transforms.csv import CsvMapping, csv_events

        m = CsvMapping("action", "guid", "time", "insert_id")
        out = csv_events(self._df(spark, tmp_path), m).collect()
        for i, r in enumerate(out):
            if i % 2 == 0:
                assert r["insert_id"] == f"csv-ins-{i}"
            else:
                assert len(r["insert_id"]) == 32  # canonical md5

    def test_profiles_keep_first_across_files(self, spark, tmp_path):
        """File-listing order wins even when a LATER file is larger (Spark
        packs splits by size; the ordering key pins filename order)."""
        from tomixpanel_spark.sources.csv import read_csv_all_strings
        from tomixpanel_spark.transforms.csv import CsvMapping, csv_profiles

        d = tmp_path / "multi"
        d.mkdir()
        # a.csv: tiny, first in listing; b.csv: much larger
        (d / "a.csv").write_text("action,guid,time,plan\nclick,gX,1600000000,first\n")
        rows = "\n".join(
            f"click,g{i},160000{i:04d},later" for i in range(500)
        )
        (d / "b.csv").write_text("action,guid,time,plan\nclick,gX,1600000001,second\n" + rows + "\n")
        m = CsvMapping("action", "guid", "time", token="tk")
        out = {r["distinct_id"]: r for r in csv_profiles(read_csv_all_strings(spark, str(d)), m).collect()}
        assert out["gX"]["set"]["plan"] == "first"

    def test_profiles_keep_first(self, spark, tmp_path):
        from tomixpanel_spark.transforms.csv import CsvMapping, csv_profiles

        m = CsvMapping("action", "guid", "time", "insert_id", ["favoriteColor"], token="tk")
        out = csv_profiles(self._df(spark, tmp_path), m).collect()
        assert len(out) == 6  # guid_0..guid_5
        first = {r["distinct_id"]: r for r in out}
        # guid_0 first occurs at row 0 -> amount '0'
        assert first["guid_0"]["set"]["amount"] == "0"
        assert first["guid_1"]["set"]["amount"] == "10"


class TestMixpanel:
    def test_export_passthrough(self, spark, tmp_path):
        from tomixpanel_spark.schemas import MP_EXPORT_SCHEMA
        from tomixpanel_spark.sources.staging import read_json_auto, valid_records
        from tomixpanel_spark.transforms.mixpanel import mp_export_events

        p = tmp_path / "export.ndjson"
        p.write_text(mp_export_lines())
        raw = valid_records(read_json_auto(spark, str(p), MP_EXPORT_SCHEMA))
        out = mp_export_events(raw).collect()
        assert len(out) == 15
        r = out[0]
        assert r["time_ms"] == 1_600_000_000 * 1000
        assert r["insert_id"] == "mp-ins-0"
        assert r["props"]["genre"] == "jazz"
        assert "distinct_id" not in r["props"]

    def test_reverse_amplitude_shape(self, spark, tmp_path):
        from tomixpanel_spark.schemas import MP_EXPORT_SCHEMA
        from tomixpanel_spark.sources.staging import read_json_auto, valid_records
        from tomixpanel_spark.transforms.mixpanel import mp_to_amplitude_events

        p = tmp_path / "export.ndjson"
        p.write_text(mp_export_lines())
        raw = valid_records(read_json_auto(spark, str(p), MP_EXPORT_SCHEMA))
        out = mp_to_amplitude_events(raw).collect()
        r = out[0]
        assert r["event_type"] == "app open"
        assert r["time"] == 1_600_000_000_000  # s -> ms (sendOther.js:171)
        assert r["event_properties"] == {"genre": "jazz"}

    def test_engage_pages_to_profiles(self, spark):
        from tomixpanel_spark.schemas import MP_ENGAGE_PAGE_SCHEMA
        from tomixpanel_spark.transforms.mixpanel import mp_engage_profiles

        pages = spark.createDataFrame(
            [mp_engage_page(0, 10, 10), mp_engage_page(1, 10, 5)],
            MP_ENGAGE_PAGE_SCHEMA,
        )
        out = mp_engage_profiles(pages, token="tok").collect()
        assert len(out) == 15
        assert all(p["ignore_time"] for p in out)
        assert out[0]["set"]["plan"] == "pro"


class TestSchemaGateDelta:
    def test_draft04_constraint_violations_pass_the_typed_gate(
        self, spark, tmp_path
    ):
        """PINNED DELTA vs the reference (round-7 VERDICT missing #1):
        the reference validates GA files against a 20,840-line JSON
        Schema draft-04 (transform/gaToMixpanel.js:51-57 with
        transform/gaSchema.json) and skips a file on ANY violation —
        including semantic constraints (enum/required/pattern) inside
        well-SHAPED JSON. This engine's gate is a typed StructType read
        + corrupt-record column + per-file skip: it catches SHAPE errors
        (wrong nesting, unparseable JSON, type mismatches that null out)
        but deliberately NOT draft-04 constraint semantics. A well-shaped
        session with out-of-vocabulary values therefore PASSES here where
        the reference would skip its file. Rationale: at 100 TB a
        draft-04 interpreter per row is a Python-UDF scale-killer; typed
        schemas + downstream truthiness rules (T5/T9 skip 'na'/empty)
        cover the values the transform actually consumes. This test
        pins the delta so the behavior is documented, not implicit."""
        import json

        from tomixpanel_spark.schemas import GA_SESSION_SCHEMA
        from tomixpanel_spark.sources.staging import (
            read_json_auto,
            valid_records_file_skip,
        )

        good = {
            "visitNumber": "1",
            "visitId": "v1",
            "visitStartTime": "1609459200",
            "fullVisitorId": "fv1",
            "hits": [{"hitNumber": "1", "time": "0", "type": "PAGE"}],
        }
        # well-SHAPED but draft-04-violating: hit.type outside the enum,
        # totals.visits not matching the all-strings pattern convention
        violating = {
            "visitNumber": "1",
            "visitId": "v2",
            "visitStartTime": "1609459201",
            "fullVisitorId": "fv2",
            "hits": [{"hitNumber": "1", "time": "0", "type": "NOT_A_HIT_TYPE"}],
        }
        # SHAPE-corrupt: hits is a scalar, not an array (unparseable into
        # the typed schema -> corrupt-record column -> file skipped)
        shape_bad = {"visitId": "v3", "hits": "not-an-array"}

        f_ok = tmp_path / "ok.ndjson"
        f_ok.write_text(json.dumps(good) + "\n" + json.dumps(violating))
        f_bad = tmp_path / "bad.ndjson"
        f_bad.write_text(json.dumps(shape_bad))

        df = read_json_auto(spark, [str(f_ok), str(f_bad)], GA_SESSION_SCHEMA)
        kept = valid_records_file_skip(df)
        ids = {r["visitId"] for r in kept.select("visitId").collect()}
        # the shape-corrupt file is skipped whole (reference parity)...
        assert "v3" not in ids
        # ...but the constraint-violating session PASSES (the delta)
        assert ids == {"v1", "v2"}


class TestDraft04ConstraintGate:
    def test_compiled_constraints_enforce_enum_required_pattern(self, spark):
        """The Catalyst-compiled draft-04 subset: enum, required, pattern,
        nested properties, and array items — evaluated as one JVM
        predicate, no per-row Python."""
        from tomixpanel_spark.functions.schema_constraints import (
            compile_constraints,
        )

        schema = {
            "type": "object",
            "required": ["visitId"],
            "properties": {
                "visitId": {"type": "string", "pattern": "^v[0-9]+$"},
                "channel": {"type": "string", "enum": ["Organic Search", "Direct"]},
                "totals": {
                    "type": "object",
                    "required": ["visits"],
                    "properties": {"visits": {"type": "string"}},
                },
                "hits": {
                    "type": "array",
                    "items": {
                        "type": "object",
                        "properties": {"type": {"enum": ["PAGE", "EVENT"]}},
                    },
                },
            },
        }
        rows = [
            # conforms fully
            ("v1", "Direct", ("3",), [("PAGE",), ("EVENT",)], True),
            # enum violation on a hit element
            ("v2", "Direct", ("1",), [("NOT_A_TYPE",)], False),
            # pattern violation
            ("x3", "Direct", ("1",), [("PAGE",)], False),
            # missing required top-level field
            (None, "Direct", ("1",), [("PAGE",)], False),
            # missing required NESTED field
            ("v5", "Direct", (None,), [("PAGE",)], False),
            # absent OPTIONAL object + absent optional enum: conforms
            ("v6", None, None, None, True),
            # top-level enum violation
            ("v7", "Paid", ("1",), [("PAGE",)], False),
        ]
        df = spark.createDataFrame(
            [(r[0], r[1], r[2], r[3]) for r in rows],
            "visitId string, channel string, "
            "totals struct<visits:string>, hits array<struct<type:string>>",
        )
        got = [
            bool(r["ok"])
            for r in df.select(compile_constraints(schema).alias("ok")).collect()
        ]
        assert got == [r[4] for r in rows]

    def test_enum_null_passes_whether_or_not_enum_lists_null(self, spark):
        """draft-04: null admissibility is `required`'s job, not enum's.
        A null value passes the enum check both when the schema lists
        null explicitly AND when it omits it — previously listing null
        INVERTED the guard and nulls were counted as violations."""
        from tomixpanel_spark.functions.schema_constraints import (
            compile_constraints,
        )

        df = spark.createDataFrame(
            [("A",), (None,), ("Z",)], "c string"
        )
        for enum in (["A", "B", None], ["A", "B"]):
            got = [
                (r["c"], bool(r["ok"]))
                for r in df.select(
                    "c",
                    compile_constraints(
                        {"type": "object", "properties": {"c": {"enum": enum}}}
                    ).alias("ok"),
                ).collect()
            ]
            assert got == [("A", True), (None, True), ("Z", False)], enum

    def test_unsupported_keywords_raise_not_silently_pass(self, spark):
        import pytest

        from tomixpanel_spark.functions.schema_constraints import (
            compile_constraints,
        )

        with pytest.raises(ValueError, match="unsupported draft-04"):
            compile_constraints(
                {"properties": {"x": {"type": "integer", "multipleOf": 3}}}
            )

    def test_constraint_file_skip_closes_the_reference_delta(
        self, spark, tmp_path
    ):
        """With the compiled gate, the reference's whole-file skip now
        fires on SEMANTIC violations too — the well-shaped
        out-of-vocabulary session that passes the typed gate
        (TestSchemaGateDelta) gets its file skipped here, matching
        transform/gaToMixpanel.js:51-57 behavior without a per-row
        Python interpreter."""
        import json

        from tomixpanel_spark.functions.schema_constraints import (
            constraint_file_skip,
        )
        from tomixpanel_spark.schemas import GA_SESSION_SCHEMA
        from tomixpanel_spark.sources.staging import read_json_auto

        rules = {
            "required": ["visitId"],
            "properties": {
                "hits": {
                    "items": {
                        "properties": {
                            "type": {"enum": ["PAGE", "EVENT", "SOCIAL"]}
                        }
                    }
                }
            },
        }
        good = {
            "visitId": "v1",
            "visitStartTime": "1609459200",
            "fullVisitorId": "fv1",
            "hits": [{"hitNumber": "1", "time": "0", "type": "PAGE"}],
        }
        violating = dict(good, visitId="v2", hits=[{"type": "NOT_A_HIT_TYPE"}])
        f_ok = tmp_path / "ok.ndjson"
        f_ok.write_text(json.dumps(good))
        f_bad = tmp_path / "bad.ndjson"
        f_bad.write_text(json.dumps(good | {"visitId": "v3"}) + "\n" + json.dumps(violating))
        df = read_json_auto(spark, [str(f_ok), str(f_bad)], GA_SESSION_SCHEMA)
        kept = constraint_file_skip(df, rules)
        ids = {r["visitId"] for r in kept.select("visitId").collect()}
        # the violating file is skipped WHOLE (v3 rode in the same file)
        assert ids == {"v1"}

    def test_pipeline_ga_constraints_option_gates_files(self, spark, tmp_path):
        """config.source.options.constraints wires the compiled draft-04
        gate into the GA pipeline: the file with a semantic violation is
        skipped whole, the conforming file flows through ga_events."""
        import json

        from tomixpanel_spark import pipeline

        good = {
            "visitId": "v1",
            "visitStartTime": "1609459200",
            "fullVisitorId": "fv1",
            "hits": [{"hitNumber": "1", "time": "0", "type": "PAGE"}],
        }
        violating = dict(good, visitId="v2",
                         hits=[{"hitNumber": "1", "time": "0", "type": "BAD"}])
        (tmp_path / "a.ndjson").write_text(json.dumps(good))
        (tmp_path / "b.ndjson").write_text(json.dumps(violating))
        plan = pipeline.build(spark, {
            "source": {"name": "ga", "options": {
                "path_to_data": str(tmp_path),
                "constraints": {
                    "required": ["visitId"],
                    "properties": {"hits": {"items": {"properties": {
                        "type": {"enum": ["PAGE", "EVENT", "SOCIAL"]}}}}},
                },
            }},
            "destination": {"name": "mixpanel", "token": "t"},
        })
        ids = {r["distinct_id"] for r in plan.events.select("distinct_id").collect()}
        assert ids == {"fv1"}  # only the conforming file's session
        n = plan.events.count()
        assert n == 3  # begins + 1 hit + ends
