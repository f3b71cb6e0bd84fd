"""Round-8 continuation lanes: RLHF/preference data prep, tokenizer
surface extensions, and further ingest formats. New module so the
per-module size budget (contract/_order.py rotation unchanged) holds.

Conventions: contract/_base.py; canonical key order: contract/_order.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ._base import ORACLES, QUERIES, ptable, q, r6, r6p, table  # noqa: F401
from ..operators.wordpiece import DEFAULT_VOCAB as _WP_VOCAB

_WP_VOCAB_SQL = ", ".join(f"'{p}'" for p in _WP_VOCAB)


@q(
    "q_dpo_pairs",
    """
    WITH p AS (
      SELECT doc_id,
             CASE WHEN doc_id % 19 = 0 THEN NULL
                  ELSE 'q ' || (doc_id % 97) END AS prompt,
             CASE WHEN doc_id % 19 = 0 THEN NULL
                  ELSE 'good ' || (doc_id % 17) END AS chosen,
             CASE WHEN doc_id % 19 = 0 THEN NULL
                  WHEN doc_id % 11 = 0 THEN 'good ' || (doc_id % 17)
                  WHEN doc_id % 13 = 0 THEN ''
                  ELSE 'meh ' || (doc_id % 5) END AS rejected
      FROM documents
    ),
    v AS (
      SELECT doc_id, prompt, chosen, rejected,
             coalesce(length(prompt) > 0 AND length(chosen) > 0
                      AND length(rejected) > 0 AND chosen <> rejected,
                      FALSE) AS valid,
             CAST(length(chosen) AS BIGINT) AS chosen_chars,
             CAST(length(rejected) AS BIGINT) AS rejected_chars,
             CAST(length(chosen) - length(rejected) AS BIGINT) AS margin,
             CASE WHEN prompt IS NOT NULL THEN
               '<|user|>' || chr(10) || prompt || chr(10) || '<|end|>'
               || chr(10) || '<|assistant|>' || chr(10) || chosen
               || chr(10) || '<|end|>'
             END AS rendered_chosen
      FROM p
    )
    SELECT doc_id, prompt, valid,
           coalesce(valid AND doc_id = min(CASE WHEN valid THEN doc_id END)
                    OVER (PARTITION BY prompt), FALSE) AS keep,
           chosen_chars, rejected_chars, margin, rendered_chosen
    FROM v
    """,
)
def q_dpo_pairs(spark, sf_dir):
    """DPO/RLHF preference-pair prep (operators/chat.py — the RLHF twin
    of q_chat_flatten): parse {prompt, chosen, rejected} JSON records,
    validate (non-empty sides, chosen ≠ rejected, parseable), render the
    chosen sequence with the shared role-tag template, compute the
    length-margin diagnostic, and dedup prompts keep-first (one hash
    shuffle on the prompt). Everything before the dedup window is pure
    codegen — no Python, no Arrow. The fixture plants every violation
    class on coprime moduli (junk JSON %19, tie %11, empty rejected
    %13) and collides prompts on %97 so the dedup has real work; the
    constructor oracle rebuilds all of it closed-form from doc_id."""
    from ..operators.chat import (
        documents_as_preference_pairs,
        keep_first_per_prompt,
        preference_prep,
    )

    pairs = documents_as_preference_pairs(ptable(spark, sf_dir))
    out = keep_first_per_prompt(preference_prep(pairs))
    return out.select(
        "doc_id", "prompt", "valid", "keep", "chosen_chars",
        "rejected_chars", "margin", "rendered_chosen",
    )


@q(
    "txt_wordpiece",
    f"""
    WITH RECURSIVE
    vocab AS (SELECT unnest([{_WP_VOCAB_SQL}]) AS piece),
    t AS (
      SELECT doc_id,
             coalesce(lower(text), '') || ' z' || (doc_id % 2) AS txt
      FROM documents
    ),
    lists AS (
      SELECT doc_id, regexp_extract_all(txt, '[a-z0-9]+') AS ws FROM t
    ),
    words AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS word_idx, ws[u.i] AS word
      FROM lists, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) u
    ),
    step AS (
      SELECT doc_id, word_idx, word, 1 AS pos, '' AS enc,
             FALSE AS failed, FALSE AS done
      FROM words
      UNION ALL
      SELECT doc_id, word_idx, word,
             CASE WHEN m IS NULL THEN pos ELSE pos + m END AS pos,
             CASE WHEN m IS NULL THEN enc
                  WHEN pos = 1 THEN substr(word, pos, m)
                  ELSE enc || ' ##' || substr(word, pos, m) END AS enc,
             m IS NULL AS failed,
             m IS NULL OR pos + m > length(word) AS done
      FROM (
        SELECT s.*,
               (SELECT max(length(v.piece)) FROM vocab v
                WHERE v.piece = substr(s.word, s.pos, length(v.piece))) AS m
        FROM step s WHERE NOT s.done
      )
    )
    SELECT doc_id, word_idx, word,
           CASE WHEN failed THEN '[UNK]' ELSE enc END AS encoded
    FROM step WHERE done
    """,
)
def txt_wordpiece(spark, sf_dir):
    """WordPiece greedy longest-match subword encode
    (operators/wordpiece.py — BERT-family tokenizer, the third
    tokenizer surface after the BPE pair in operators/bpe.py). Pure
    JVM: pre-tokenize with regexp_extract_all + posexplode, then ONE
    ``F.aggregate`` scan per word whose longest-match probe is a
    bounded when-chain against the literal vocab — no Python, no UDF,
    no shuffle. The oracle replays the greedy scan as a recursive CTE
    whose per-step longest match is a correlated max over the same
    vocab list (generated from the SAME ``DEFAULT_VOCAB`` constant, so
    the two sides cannot drift). The fixture appends a planted
    ``z0``/``z1`` token per doc — 'z' and digits are excluded from the
    vocab, so the ``[UNK]`` branch exists under the oracle."""
    from ..operators.wordpiece import wordpiece_encode

    docs = ptable(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" z"),
            (F.col("doc_id") % 2).cast("string"),
        ).alias("text"),
    )
    return wordpiece_encode(docs)


@q(
    "mm_cbor_records",
    """
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t, 1 + doc_id % 3 AS k
      FROM documents
    ),
    s AS (SELECT doc_id, t, unnest(range(k)) AS seq FROM d)
    SELECT doc_id AS media_id,
           doc_id,
           CAST(seq AS BIGINT) AS seq,
           CASE WHEN seq = 2 THEN NULL ELSE t END AS body,
           doc_id % 89 + seq / 4.0 AS score
    FROM s
    """,
)
def mm_cbor_records(spark, sf_dir):
    """CBOR dump ingest (sources/cbor.py — RFC 8949, the IETF twin of
    the msgpack lane): documents_as_cbor writes REAL CBOR streams (k
    record maps + a trailing TAGGED bare int the lane must skip —
    exercising the transparent-tag path), cbor_records walks them back
    onto the shared (doc_id, seq, body, score) ingest shape. The
    fixture's value domain encodes bijectively (dyadic scores, null
    body byte at seq 2), so one constructor oracle pins the head/
    argument decode across the uint width ladder, text strings, null,
    float64 and the map walk. mapInPandas, zero shuffle, per-payload
    degrade."""
    from ..sources.cbor import cbor_records, documents_as_cbor

    media = documents_as_cbor(ptable(spark, sf_dir))
    return cbor_records(media)


@q(
    "mm_ics_events",
    """
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 3 AS k,
             '2026' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')
                    || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') AS ymd,
             lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') AS hh
      FROM documents
    ),
    s AS (SELECT doc_id, ymd, hh, unnest(range(k)) AS i FROM d)
    SELECT doc_id,
           CAST(i AS BIGINT) AS event_idx,
           'ev-' || doc_id || '-' || i AS uid,
           'Event ' || doc_id AS summary,
           strptime(ymd || ' ' || hh || ':'
                    || lpad(CAST(i * 10 AS VARCHAR), 2, '0'),
                    '%Y%m%d %H:%M') AS dtstart,
           strptime(ymd || ' ' || hh || ':'
                    || CAST(i * 10 + 30 + (doc_id % 2) * 5 AS VARCHAR),
                    '%Y%m%d %H:%M') AS dtend,
           CASE WHEN i % 2 = 0 THEN 'Room ' || i || ', A' END AS location,
           CAST(1800 + (doc_id % 2) * 300 AS BIGINT) AS duration_s
    FROM s
    """,
)
def mm_ics_events(spark, sf_dir):
    """iCalendar (RFC 5545) VEVENT explosion
    (operators/markup.py::ics_events): line UNFOLDING (CRLF +
    space continuation), DOTALL block explode, parameter-tolerant
    property heads (``DTSTART;TZID=…:`` on even doc_ids), TEXT
    unescaping (``\\,`` in LOCATION), timestamp_ntz DATE-TIMEs
    (session-timezone-independent — survives the driverlike non-UTC
    session), and a VTIMEZONE decoy component that must yield no rows.
    Pure codegen + one explode, zero shuffle. Constructor oracle:
    every output field rebuilt closed-form from doc_id."""
    from ..operators.markup import documents_as_ics, ics_events

    return ics_events(documents_as_ics(ptable(spark, sf_dir)))


@q(
    "mm_hls_entries",
    """
    WITH med AS (
      SELECT doc_id, unnest(range(2 + doc_id % 3)) AS i
      FROM documents WHERE doc_id % 2 = 0
    ),
    seg AS (
      SELECT doc_id, CAST(i AS BIGINT) AS entry_idx, 'segment' AS kind,
             'seg' || i || '.ts' AS uri,
             4 + i / 4.0 AS duration_s,
             CASE WHEN i % 2 = 0 THEN 'Seg ' || (doc_id % 50) END AS title,
             CAST(NULL AS BIGINT) AS bandwidth,
             CAST(NULL AS BIGINT) AS width,
             CAST(NULL AS BIGINT) AS height,
             CAST(5 + doc_id % 3 AS BIGINT) AS target_duration,
             doc_id % 4 = 0 AS endlist
      FROM med
    ),
    mas AS (
      SELECT doc_id, unnest([0, 1]) AS i
      FROM documents WHERE doc_id % 2 = 1
    ),
    var AS (
      SELECT doc_id, CAST(i AS BIGINT) AS entry_idx, 'variant' AS kind,
             CASE WHEN i = 0 THEN 'hi.m3u8' ELSE 'lo.m3u8' END AS uri,
             CAST(NULL AS DOUBLE) AS duration_s,
             CAST(NULL AS VARCHAR) AS title,
             CAST((1 + doc_id % 7) * 100000 / (1 + i) AS BIGINT) AS bandwidth,
             CAST(CASE WHEN i = 0 THEN 1280 ELSE 640 END AS BIGINT) AS width,
             CAST(CASE WHEN i = 0 THEN 720 ELSE 360 END AS BIGINT) AS height,
             CAST(NULL AS BIGINT) AS target_duration,
             FALSE AS endlist
      FROM mas
    )
    SELECT * FROM seg UNION ALL SELECT * FROM var
    """,
)
def mm_hls_entries(spark, sf_dir):
    """HLS playlist explosion (operators/markup.py::hls_entries — RFC
    8216, the video-delivery manifest format crawls are full of): media
    playlists (#EXTINF + URI pairing, dyadic durations, optional
    titles, TARGETDURATION/ENDLIST headers) and master playlists
    (#EXT-X-STREAM-INF attrs: BANDWIDTH, RESOLUTION WxH) onto ONE row
    shape with a kind discriminator. Pure codegen full-match
    regexp_extract_all + posexplode, zero shuffle. Constructor oracle:
    even doc_ids media / odd master, every field closed-form."""
    from ..operators.markup import documents_as_m3u8, hls_entries

    return hls_entries(documents_as_m3u8(ptable(spark, sf_dir)))


@q(
    "txt_po_entries",
    """
    WITH d AS (SELECT doc_id, 1 + doc_id % 3 AS k FROM documents),
    s AS (SELECT doc_id, unnest(range(k)) AS i FROM d)
    SELECT doc_id,
           CAST(i AS BIGINT) AS entry_idx,
           CASE WHEN i = 2 THEN 'menu' END AS msgctxt,
           CASE WHEN i = 0 AND doc_id % 6 = 0
                THEN 'Say "hi" ' || doc_id || '-0'
                ELSE 'Hello ' || doc_id || '-' || i END AS msgid,
           CASE WHEN (doc_id + i) % 5 = 0 THEN ''
                ELSE 'Bonjour ' || doc_id || '-' || i END AS msgstr,
           (doc_id + i) % 4 = 0 AS fuzzy,
           (doc_id + i) % 5 <> 0 AS translated
    FROM s
    """,
)
def txt_po_entries(spark, sf_dir):
    """gettext PO catalog explosion (operators/gettext.py — the
    parallel-corpus mining lane): blank-line entry split, multi-line
    quoted-run reassembly, C-escape handling (``\\"``, ``\\n``),
    msgctxt, ``#, fuzzy`` flags, untranslated detection, header-entry
    drop. Codegen except one per-catalog window for the post-drop
    entry renumbering (partitioned by doc — no global window).
    Constructor oracle: every entry rebuilt closed-form from doc_id,
    including the escaped-quote and multi-line msgid branches."""
    from ..operators.gettext import documents_as_po, po_entries

    return po_entries(documents_as_po(ptable(spark, sf_dir)))


@q(
    "q_geojson_features",
    """
    WITH base AS (
      SELECT doc_id, unnest(range(1 + doc_id % 2)) AS i FROM documents
    ),
    feat AS (
      SELECT doc_id, CAST(i AS BIGINT) AS feat_idx,
             CASE WHEN doc_id % 3 = 0 THEN 'Point'
                  WHEN doc_id % 3 = 1 THEN 'LineString'
                  ELSE 'Polygon' END AS geom_type,
             CASE WHEN i = 0 THEN 'f' || doc_id || '-0' END AS name,
             CAST(CASE WHEN doc_id % 3 = 0 THEN 1
                       WHEN doc_id % 3 = 1 THEN 3
                       ELSE 5 END AS BIGINT) AS n_points,
             CASE WHEN doc_id % 3 = 0 THEN doc_id % 10 + 0.5
                  WHEN doc_id % 3 = 1 THEN CAST(doc_id % 4 AS DOUBLE)
                  ELSE CAST(doc_id % 6 AS DOUBLE) END AS min_x,
             CASE WHEN doc_id % 3 = 0 THEN doc_id % 7 + 0.25
                  WHEN doc_id % 3 = 1 THEN CAST(doc_id % 3 AS DOUBLE)
                  ELSE CAST(doc_id % 5 AS DOUBLE) END AS min_y,
             CASE WHEN doc_id % 3 = 0 THEN doc_id % 10 + 0.5
                  WHEN doc_id % 3 = 1 THEN CAST(doc_id % 4 + 4 AS DOUBLE)
                  ELSE CAST(doc_id % 6 + 2 AS DOUBLE) END AS max_x,
             CASE WHEN doc_id % 3 = 0 THEN doc_id % 7 + 0.25
                  WHEN doc_id % 3 = 1 THEN CAST(doc_id % 3 + 2 AS DOUBLE)
                  ELSE CAST(doc_id % 5 + 3 AS DOUBLE) END AS max_y
      FROM base
    ),
    dec AS (
      SELECT doc_id, CAST(1 + doc_id % 2 AS BIGINT) AS feat_idx,
             'Weird' AS geom_type, CAST(NULL AS VARCHAR) AS name,
             CAST(NULL AS BIGINT) AS n_points,
             CAST(NULL AS DOUBLE) AS min_x, CAST(NULL AS DOUBLE) AS min_y,
             CAST(NULL AS DOUBLE) AS max_x, CAST(NULL AS DOUBLE) AS max_y
      FROM documents WHERE doc_id % 7 = 0
    )
    SELECT * FROM feat UNION ALL SELECT * FROM dec
    """,
)
def q_geojson_features(spark, sf_dir):
    """GeoJSON feature explosion on Spark 4 VARIANT
    (operators/geojson.py — RFC 7946): ``parse_json`` → VARIANT,
    ``try_variant_get`` typed path access, VARIANT-array transform for
    the bbox math. GeoJSON's type-dependent coordinates nesting is
    exactly what VARIANT exists for (a fixed from_json schema cannot
    hold Point/LineString/Polygon at once). Zero shuffle, no Python.
    Fixture rotates all three geometry types by doc_id % 3, plants a
    name-less properties branch and an unknown-geometry decoy
    (doc_id % 7) whose fields must all be NULL."""
    from ..operators.geojson import documents_as_geojson, geojson_features

    return geojson_features(
        documents_as_geojson(ptable(spark, sf_dir))
    )


@q(
    "mm_midi_notes",
    """
    WITH d AS (SELECT doc_id, 1 + doc_id % 3 AS k FROM documents),
    s AS (SELECT doc_id, unnest(range(k)) AS i FROM d)
    SELECT doc_id AS media_id,
           CAST(i AS BIGINT) AS note_idx,
           CAST(doc_id % 4 AS BIGINT) AS channel,
           CAST(60 + (doc_id + i) % 12 AS BIGINT) AS key,
           CAST(64 + i AS BIGINT) AS velocity,
           CAST(i * 48 AS BIGINT) AS start_tick,
           CAST(24 + (doc_id % 2) * 12 AS BIGINT) AS dur_ticks,
           CAST(96 AS BIGINT) AS division
    FROM s
    """,
)
def mm_midi_notes(spark, sf_dir):
    """Standard-MIDI-File note extraction (operators/midicodec.py —
    the symbolic-music multimodal lane): documents_as_midi writes REAL
    single-track SMFs (tempo meta event, varint delta-times, note-offs
    in BOTH wire encodings — explicit 0x8n and running-status
    vel-0 note-on, alternating by key parity), midi_notes walks them
    back into paired (start, duration, channel, key, velocity) rows.
    MIDI is lossless and integer-valued, so one constructor oracle pins
    the header parse, the varint walk, running status, meta skipping
    and the on/off pairing. mapInPandas, zero shuffle, per-payload
    degrade."""
    from ..operators.midicodec import documents_as_midi, midi_notes

    return midi_notes(documents_as_midi(ptable(spark, sf_dir)))


@q(
    "mm_rtf_text",
    """
    SELECT doc_id,
           coalesce(text, '') || chr(10) || 'Caf' || chr(233) || ' '
             || chr(8212) || ' row ' || (doc_id % 50) || ' ' || chr(10)
             AS text,
           CAST(length(coalesce(text, '') || chr(10) || 'Caf' || chr(233)
             || ' ' || chr(8212) || ' row ' || (doc_id % 50) || ' '
             || chr(10)) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def mm_rtf_text(spark, sf_dir):
    """RTF text extraction (operators/rtf.py — the word-processor
    sibling of mm_docx_text): stack-based group walker (destination
    groups including nested sub-groups and starred destinations are
    dropped wholesale — beyond regex), control-word delimiter-space
    consumption, ``\\'hh`` hex and ``\\uN``+fallback unicode escapes,
    ``\\par``/``\\b`` handling. The fixture threads the document text
    through a realistic formatted body (font/color tables, generator
    destination, bold toggles, é and an em-dash escape), so the
    constructor oracle pins every walker rule. mapInPandas, zero
    shuffle, per-payload degrade (length(text) counts é/— as ONE char
    on both sides — both are UTF-8-aware)."""
    from ..operators.rtf import documents_as_rtf, rtf_extract

    return rtf_extract(documents_as_rtf(ptable(spark, sf_dir)))


@q(
    "mm_vcard_contacts",
    """
    WITH base AS (
      SELECT doc_id, unnest(range(1 + doc_id % 2)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS card_idx,
           'Person ' || doc_id || '-' || i AS fn,
           'Last' || (doc_id % 30) AS family,
           'First' || (i % 5) AS given,
           CASE WHEN doc_id % 3 = 0
                THEN 'Acme, Inc ' || (doc_id % 20) END AS org,
           CAST(1 + (doc_id + i) % 2 AS BIGINT) AS n_emails,
           'p' || doc_id || '-' || i || '-0@example.com' AS first_email,
           CASE WHEN i % 2 = 0 THEN '+1-555-010' || i END AS tel
    FROM base
    """,
)
def mm_vcard_contacts(spark, sf_dir):
    """vCard contact explosion (operators/markup.py::vcard_contacts —
    RFC 6350, the contact-graph ingest lane): shares the iCalendar
    machinery (unfolding, block explode, parameter heads, unescaping)
    plus the structured N split on unescaped ';' and repeated-EMAIL
    counting. The fixture folds the FN line, escapes a comma in ORG,
    parameterizes the first EMAIL, and rotates every NULL branch on
    coprime moduli. Pure codegen + one explode, zero shuffle;
    constructor oracle closed-form in doc_id."""
    from ..operators.markup import documents_as_vcf, vcard_contacts

    return vcard_contacts(documents_as_vcf(ptable(spark, sf_dir)))


@q(
    "q_toml_entries",
    """
    SELECT doc_id, CAST(NULL AS VARCHAR) AS section, 'title' AS key_name,
           'string' AS vtype, 'Doc ' || doc_id AS str_val,
           CAST(NULL AS DOUBLE) AS num_val, CAST(NULL AS BOOLEAN) AS bool_val
    FROM documents
    UNION ALL
    SELECT doc_id, NULL, 'count', 'int', NULL,
           CAST(doc_id % 100 AS DOUBLE), NULL FROM documents
    UNION ALL
    SELECT doc_id, NULL, 'ratio', 'float', NULL,
           doc_id % 7 + 0.25, NULL FROM documents
    UNION ALL
    SELECT doc_id, NULL, 'active', 'bool', NULL, NULL,
           doc_id % 2 = 0 FROM documents
    UNION ALL
    SELECT doc_id, NULL, 'tags', 'other', '[1, 2]', NULL, NULL
    FROM documents
    UNION ALL
    SELECT doc_id, 'owner', 'name', 'string', 'User ' || (doc_id % 30),
           NULL, NULL FROM documents
    UNION ALL
    SELECT doc_id, 'owner', 'level', 'int', NULL,
           CAST(doc_id % 5 AS DOUBLE), NULL FROM documents
    UNION ALL
    SELECT doc_id, 'features', 'flag', 'bool', NULL, NULL, TRUE
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def q_toml_entries(spark, sf_dir):
    """TOML config mining (operators/configs.py): line explode →
    section-header FORWARD FILL over a doc-partitioned line-ordered
    window (the windows.py ffill idiom applied to parsing) → typed
    key/value rows (string/int/float/bool, arrays as vtype='other').
    Comment stripping (full-line + trailing) pinned by the fixture.
    Codegen + one doc-partitioned window, no Python. Constructor
    oracle: the full key inventory rebuilt closed-form as a UNION."""
    from ..operators.configs import documents_as_toml, toml_entries

    return toml_entries(documents_as_toml(ptable(spark, sf_dir)))


@q(
    "mm_bson_records",
    """
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t, 1 + doc_id % 3 AS k
      FROM documents
    ),
    s AS (SELECT doc_id, t, unnest(range(k)) AS seq FROM d)
    SELECT doc_id AS media_id,
           doc_id,
           CAST(seq AS BIGINT) AS seq,
           CASE WHEN seq = 2 THEN NULL ELSE t END AS body,
           doc_id % 89 + seq / 4.0 AS score
    FROM s
    """,
)
def mm_bson_records(spark, sf_dir):
    """BSON dump ingest (sources/bson.py — bsonspec.org v1.1, the
    mongodump format): documents_as_bson writes REAL concatenated BSON
    documents (int32/int64 width rotation via a 2^40 shadow field the
    lane must ignore, null body element at seq 2, dyadic double
    scores), bson_records walks them back onto the shared (doc_id,
    seq, body, score) ingest shape — the third schemaless dump family
    next to mm_msgpack_records and mm_cbor_records, same oracle form.
    mapInPandas, zero shuffle, per-payload degrade."""
    from ..sources.bson import bson_records, documents_as_bson

    return bson_records(documents_as_bson(ptable(spark, sf_dir)))


@q(
    "q_xml_records",
    """
    WITH base AS (
      SELECT doc_id, unnest(range(1 + doc_id % 3)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS rec_idx,
           CAST(doc_id * 10 + i AS BIGINT) AS id,
           CASE WHEN doc_id % 4 = 0 THEN 'A & B ' || (doc_id % 60)
                ELSE 'Part ' || (doc_id % 60) END AS name,
           doc_id % 90 + 0.25 AS price,
           CASE WHEN doc_id % 2 = 0 THEN 'usd' ELSE 'eur' END AS currency,
           CASE WHEN i % 2 = 0 THEN 'say "hi" item ' || i END AS "desc"
    FROM base
    """,
)
def q_xml_records(spark, sf_dir):
    """Generic XML record explosion
    (operators/markup.py::xml_records — the spark-xml-lite surface): a
    caller-specified record tag and field paths (child text,
    record-tag attribute, child attribute) onto one row per record,
    entities unescaped. Pure codegen + one explode, zero shuffle;
    string columns cast by the caller (the CSV-lane division of
    labor). Fixture: catalog <item> records with id attribute,
    entity-laden <name>, attribute-on-child currency, and an optional
    <desc>; constructor oracle closed-form in doc_id."""
    from ..operators.markup import documents_as_xml, xml_records

    raw = xml_records(
        documents_as_xml(ptable(spark, sf_dir)),
        record_tag="item",
        fields=[
            ("id", "@id"),
            ("name", "name"),
            ("price", "price"),
            ("currency", "price@currency"),
            ("desc", "desc"),
        ],
    )
    return raw.select(
        "doc_id",
        "rec_idx",
        F.col("id").cast("long").alias("id"),
        "name",
        F.col("price").cast("double").alias("price"),
        "currency",
        "desc",
    )


@q(
    "txt_latex_extract",
    """
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t, 1 + doc_id % 3 AS k
      FROM documents
    )
    SELECT doc_id,
           'Study ' || (doc_id % 70) AS title,
           CAST(k AS BIGINT) AS n_sections,
           CAST(k AS BIGINT) AS n_cites,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_equations,
           chr(10) || 'Part 0' || chr(10) || t || ' cited.'
           || CASE WHEN k >= 2 THEN chr(10) || 'Part 1' || chr(10)
                || 'More 1 of doc ' || doc_id || ' cited.' ELSE '' END
           || CASE WHEN k >= 3 THEN chr(10) || 'Part 2' || chr(10)
                || 'More 2 of doc ' || doc_id || ' cited.' ELSE '' END
           || chr(10) || 'Rate is 100% with gap noted.' || chr(10) AS text
    FROM d
    """,
)
def txt_latex_extract(spark, sf_dir):
    """LaTeX prose extraction (operators/latex.py — the arXiv-paper
    ingest lane): comment stripping with escaped-``\\%`` lookbehind,
    equation/figure environment drops (counted first), preamble cut at
    ``\\begin{document}``, inline-math and cite/ref removal,
    section/emphasis commands keeping their arguments, generic
    one-level command collapse, TeX escape unescaping. Pure codegen
    regexp chain, zero shuffle. The fixture threads the document text
    through a realistic paper skeleton; constructor oracle rebuilds
    the full extracted text closed-form (documents text verified free
    of TeX specials at all SFs)."""
    from ..operators.latex import documents_as_latex, latex_extract

    return latex_extract(documents_as_latex(ptable(spark, sf_dir)))


@q(
    "q_wordpiece_stats",
    f"""
    WITH RECURSIVE
    vocab AS (SELECT unnest([{_WP_VOCAB_SQL}]) AS piece),
    t AS (
      SELECT doc_id,
             coalesce(lower(text), '') || ' z' || (doc_id % 2) AS txt
      FROM documents
    ),
    lists AS (
      SELECT doc_id, regexp_extract_all(txt, '[a-z0-9]+') AS ws FROM t
    ),
    words AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS word_idx, ws[u.i] AS word
      FROM lists, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) u
    ),
    step AS (
      SELECT doc_id, word_idx, word, 1 AS pos, '' AS enc,
             FALSE AS failed, FALSE AS done
      FROM words
      UNION ALL
      SELECT doc_id, word_idx, word,
             CASE WHEN m IS NULL THEN pos ELSE pos + m END AS pos,
             CASE WHEN m IS NULL THEN enc
                  WHEN pos = 1 THEN substr(word, pos, m)
                  ELSE enc || ' ##' || substr(word, pos, m) END AS enc,
             m IS NULL AS failed,
             m IS NULL OR pos + m > length(word) AS done
      FROM (
        SELECT s.*,
               (SELECT max(length(v.piece)) FROM vocab v
                WHERE v.piece = substr(s.word, s.pos, length(v.piece))) AS m
        FROM step s WHERE NOT s.done
      )
    ),
    enc AS (
      SELECT doc_id, failed,
             CASE WHEN failed THEN NULL
                  ELSE len(string_split(enc, ' ')) END AS n_pieces
      FROM step WHERE done
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(CASE WHEN failed THEN 1 ELSE 0 END) AS BIGINT) AS n_unk,
           CAST(coalesce(sum(n_pieces), 0) AS BIGINT) AS n_pieces,
           round(CAST(sum(CASE WHEN failed THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS unk_rate,
           round(CAST(sum(n_pieces) AS DOUBLE)
                 / nullif(count(*) - sum(CASE WHEN failed THEN 1 ELSE 0 END),
                          0), 6) AS fertility
    FROM enc GROUP BY doc_id
    """,
)
def q_wordpiece_stats(spark, sf_dir):
    """Tokenizer evaluation report over the WordPiece lane: per-doc
    word count, [UNK] count/rate, subword piece count, and FERTILITY
    (pieces per covered word — the number tokenizer papers actually
    report; Rust et al. 2021). One groupBy over the zero-shuffle
    encode; ANSI-safe nullif division. The oracle wraps the same
    recursive-CTE greedy replay in the aggregate."""
    from ..operators.wordpiece import UNK, wordpiece_encode

    docs = ptable(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" z"),
            (F.col("doc_id") % 2).cast("string"),
        ).alias("text"),
    )
    enc = wordpiece_encode(docs)
    failed = F.col("encoded") == UNK
    pieces = F.when(~failed, F.size(F.split(F.col("encoded"), " ")))
    return enc.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(failed.cast("long")).alias("n_unk"),
        F.coalesce(F.sum(pieces), F.lit(0)).cast("long").alias("n_pieces"),
        F.round(
            F.sum(failed.cast("long")).cast("double") / F.count("*"), 6
        ).alias("unk_rate"),
        F.round(
            F.sum(pieces).cast("double")
            / F.nullif(
                (F.count("*") - F.sum(failed.cast("long"))).cast("double"),
                F.lit(0.0),
            ),
            6,
        ).alias("fertility"),
    )


@q(
    "q_access_logs",
    """
    WITH d AS (SELECT doc_id, doc_id % 11 = 0 AS junk FROM documents)
    SELECT doc_id,
           CASE WHEN junk THEN NULL
                ELSE '10.0.' || (doc_id % 50) || '.7' END AS host,
           CASE WHEN junk THEN NULL
                WHEN doc_id % 2 = 0 THEN 'GET' ELSE 'POST' END AS method,
           CASE WHEN junk THEN NULL
                ELSE '/page/' || (doc_id % 200) || '?q=' || (doc_id % 9)
                END AS path,
           CASE WHEN junk THEN NULL
                ELSE CAST(CASE doc_id % 4 WHEN 0 THEN 200 WHEN 1 THEN 301
                          WHEN 2 THEN 404 ELSE 503 END AS BIGINT)
                END AS status,
           CASE WHEN junk THEN NULL
                WHEN doc_id % 9 = 0 THEN 0
                ELSE CAST(512 + doc_id % 4096 AS BIGINT) END AS bytes,
           CASE WHEN junk OR doc_id % 3 = 0 THEN NULL
                ELSE 'https://ref' || (doc_id % 12) || '.example.com/'
                END AS referer,
           CASE WHEN junk THEN NULL
                WHEN doc_id % 5 = 0
                THEN 'FetchBot/2.1 (+https://bots.example.com)'
                ELSE 'Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101'
                END AS user_agent,
           CASE WHEN junk THEN NULL
                ELSE make_timestamp(2026, 3, 1 + doc_id % 28, doc_id % 24,
                                    doc_id % 60, (doc_id * 7) % 60)
                     - CASE WHEN doc_id % 7 = 0 THEN INTERVAL 2 HOUR
                            ELSE INTERVAL 0 HOUR END
                END AS ts_utc,
           CASE WHEN junk THEN FALSE ELSE doc_id % 5 = 0 END AS bot,
           NOT junk AS parsed
    FROM d
    """,
)
def q_access_logs(spark, sf_dir):
    """Apache/nginx combined access-log parsing
    (operators/weblogs.py — the crawl/ops telemetry lane): anchored
    combined-format regex, '-'-as-zero bytes, locale-proof month
    lookup, ARITHMETIC timezone-offset normalization to UTC
    timestamp_ntz (survives the driverlike non-UTC session — the
    fixture plants +0200 lines on doc_id % 7), bot classification from
    the user-agent, and a parsed=false degrade branch for junk lines
    (doc_id % 11). Pure codegen, zero shuffle; constructor oracle
    closed-form in doc_id."""
    from ..operators.weblogs import access_log_entries, documents_as_access_logs

    return access_log_entries(
        documents_as_access_logs(ptable(spark, sf_dir))
    )


@q(
    "mm_sqldump_rows",
    """
    WITH d AS (
      SELECT doc_id, 1 + doc_id % 2 AS n_stmt, 2 + doc_id % 2 AS n_tup
      FROM documents
    ),
    s AS (SELECT doc_id, n_tup, unnest(range(n_stmt)) AS stmt FROM d),
    t AS (SELECT doc_id, stmt, unnest(range(n_tup)) AS i FROM s)
    SELECT doc_id,
           CAST(stmt AS BIGINT) AS stmt_idx,
           CAST(i AS BIGINT) AS tuple_idx,
           CAST(doc_id * 100 + stmt * 10 + i AS VARCHAR) AS id,
           CASE WHEN doc_id % 6 = 0 THEN 'it''s page ' || (doc_id % 40)
                ELSE 'page ' || (doc_id % 40) END AS title,
           (doc_id % 9) || '.25' AS score,
           CASE WHEN i % 2 = 1 THEN NULL
                ELSE CAST(doc_id % 8 AS VARCHAR) END AS flags
    FROM t
    """,
)
def mm_sqldump_rows(spark, sf_dir):
    """mysqldump INSERT-tuple extraction (operators/sqldump.py — the
    format Wikipedia/Wikidata actually publish): DDL prologue and
    decoy-table INSERTs ignored, multi-row VALUES lists exploded,
    quoted strings with ``''`` escapes folded, bare NULL → NULL. Pure
    codegen (statement → tuple → field regexp_extract_all chain), zero
    shuffle, string-typed output (the CSV/XML-lane casting contract).
    Constructor oracle closed-form in doc_id, including the
    escaped-quote branch."""
    from ..operators.sqldump import documents_as_sqldump, sqldump_rows

    return sqldump_rows(
        documents_as_sqldump(ptable(spark, sf_dir)),
        "page",
        ["id", "title", "score", "flags"],
    )


@q(
    "q_span_corruption",
    r"""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(coalesce(text, ''), '\S+') AS ws
      FROM documents
    ),
    tok AS (
      SELECT doc_id, u.i - 1 AS i, ws[u.i] AS tok, len(ws) AS n
      FROM t, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) u
    ),
    agg AS (
      SELECT doc_id,
             max(n) AS n_tokens,
             sum(CASE WHEN i % 7 < 2 THEN 1 ELSE 0 END) AS n_masked,
             string_agg(
               CASE WHEN i % 7 = 0 THEN '<extra_id_' || (i // 7) || '>'
                    WHEN i % 7 < 2 THEN NULL ELSE tok END,
               ' ' ORDER BY i) AS input,
             string_agg(
               CASE WHEN i % 7 = 0
                    THEN '<extra_id_' || (i // 7) || '> ' || tok
                    WHEN i % 7 < 2 THEN tok END,
               ' ' ORDER BY i) AS target
      FROM tok GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(a.n_masked, 0) AS BIGINT) AS n_masked,
           coalesce(a.input, '') AS input,
           coalesce(a.target, '') AS target
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def q_span_corruption(spark, sf_dir):
    """T5/UL2 span-corruption prep (operators/denoise.py — the
    denoising-objective twin of the packing/chunking lanes): mask a
    2-token span every 7 tokens with <extra_id_k> sentinels, emit the
    (input, target) pair plus token/mask counts. Deterministic-stride
    variant so the whole map is exactly oracle-able (the same seeded-
    determinism trade the sampling lanes make). Pure JVM higher-order
    functions on the token array — transform-with-index + NULL-skipping
    array_join — zero shuffle, no explode, no Python. Oracle replays it
    as unnest-with-ordinality + ordered string_agg."""
    from ..operators.denoise import span_corrupt

    out = span_corrupt(ptable(spark, sf_dir))
    return out.select("doc_id", "n_tokens", "n_masked", "input", "target")


@q(
    "q_fim_transform",
    """
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t,
             length(coalesce(text, '')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, t, n,
             CAST(floor(n * (CAST(1 AS DOUBLE) / 3)) AS INT) AS c1,
             CAST(floor(n * (CAST(2 AS DOUBLE) / 3)) AS INT) AS c2
      FROM d
    )
    SELECT doc_id,
           CAST(c1 AS BIGINT) AS n_prefix,
           CAST(c2 - c1 AS BIGINT) AS n_middle,
           CAST(n - c2 AS BIGINT) AS n_suffix,
           CASE WHEN doc_id % 2 = 0 THEN
             '<PRE>' || substr(t, 1, c1) || '<SUF>' || substr(t, c2 + 1)
             || '<MID>' || substr(t, c1 + 1, c2 - c1)
           ELSE
             '<SUF>' || substr(t, c2 + 1) || '<PRE>' || substr(t, 1, c1)
             || '<MID>' || substr(t, c1 + 1, c2 - c1)
           END AS fim
    FROM c
    """,
)
def q_fim_transform(spark, sf_dir):
    """Fill-in-the-middle prep (operators/denoise.py::fim_transform —
    Bavarian et al. 2022, the code-model pretraining objective): split
    at deterministic character-fraction cut points, rejoin with
    <PRE>/<SUF>/<MID> sentinels — PSM order on even doc_ids, SPM on
    odd, so both renders sit under the oracle. Pure codegen substring
    arithmetic, zero shuffle. The cut points use the same IEEE double
    (1/3, 2/3) on both engines, so floor() agrees exactly."""
    from ..operators.denoise import fim_transform

    docs = ptable(spark, sf_dir)
    psm = fim_transform(docs.filter(F.col("doc_id") % 2 == 0), mode="psm")
    spm = fim_transform(docs.filter(F.col("doc_id") % 2 == 1), mode="spm")
    cols = ["doc_id", "n_prefix", "n_middle", "n_suffix", "fim"]
    return psm.select(*cols).unionAll(spm.select(*cols))


@q(
    "q_rss_items",
    """
    WITH base AS (
      SELECT doc_id, unnest(range(1 + doc_id % 3)) AS i FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS rec_idx,
           CASE WHEN doc_id % 4 = 0 THEN 'News & views ' || (doc_id % 80)
                ELSE 'Episode ' || (doc_id % 80) END AS title,
           'https://pod' || (doc_id % 30) || '.example.com/' || doc_id
             || '-' || i AS link,
           'tag:' || doc_id || '-' || i AS guid,
           CASE WHEN i % 2 = 0
                THEN 'https://cdn.example.com/ep' || doc_id || '-' || i
                     || '.mp3' END AS enclosure_url,
           CASE WHEN i % 2 = 0
                THEN CAST(10000 + doc_id % 5000 AS BIGINT)
                END AS enclosure_bytes,
           make_timestamp(2026, 4, 1 + doc_id % 28, doc_id % 24, i, 0)
             - CASE WHEN doc_id % 5 = 0 THEN INTERVAL 2 HOUR
                    ELSE INTERVAL 0 HOUR END AS pub_ts
    FROM base
    """,
)
def q_rss_items(spark, sf_dir):
    """RSS 2.0 feed explosion (operators/markup.py::rss_items — the
    syndication/podcast ingest lane), built as a COMPOSITION of the
    generic xml_records operator (child-text + attribute-on-child
    paths) plus an RFC-822 pubDate parse with arithmetic UTC offset
    normalization (GMT and +0200 branches both planted). Pure codegen,
    zero shuffle; constructor oracle closed-form in doc_id."""
    from ..operators.markup import documents_as_rss, rss_items

    return rss_items(documents_as_rss(ptable(spark, sf_dir)))


@q(
    "q_merge_upsert",
    """
    WITH b AS (SELECT doc_id FROM documents)
    SELECT doc_id AS k,
           CASE WHEN doc_id % 5 = 1 AND doc_id % 3 <> 0 THEN NULL
                WHEN doc_id % 3 = 0 THEN 'u' || (doc_id % 100)
                ELSE 'v' || (doc_id % 100) END AS val,
           CASE WHEN doc_id % 5 = 1 AND doc_id % 3 <> 0 THEN NULL
                WHEN doc_id % 3 = 0 THEN CAST(doc_id % 7 + 1 AS BIGINT)
                ELSE CAST(doc_id % 7 AS BIGINT) END AS score,
           CASE WHEN doc_id % 5 = 1 AND doc_id % 3 <> 0 THEN 'delete'
                WHEN doc_id % 3 = 0 THEN 'update'
                ELSE 'keep' END AS action
    FROM b
    UNION ALL
    SELECT -doc_id - 1 AS k,
           'n' || (doc_id % 100) AS val,
           CAST(9 AS BIGINT) AS score,
           'insert' AS action
    FROM documents WHERE doc_id % 7 = 2
    """,
)
def q_merge_upsert(spark, sf_dir):
    """MERGE / CDC apply (operators/merge.py — the lakehouse upsert
    Spark only ships via table formats, computed engine-level): ONE
    full-outer hash join applies a change batch (updates %3, tombstone
    deletes %5 exclusive of updates, inserts on fresh keys %7) to the
    base snapshot, emitting the audited action column. Constructor
    oracle: the post-merge snapshot rebuilt closed-form as CASE + an
    insert UNION."""
    from ..operators.merge import merge_upsert

    d = F.col("doc_id")
    docs = ptable(spark, sf_dir)
    base = docs.select(
        d.alias("k"),
        F.concat(F.lit("v"), (d % 100).cast("string")).alias("val"),
        (d % 7).cast("long").alias("score"),
    )
    updates = docs.filter(d % 3 == 0).select(
        d.alias("k"),
        F.concat(F.lit("u"), (d % 100).cast("string")).alias("val"),
        (d % 7 + 1).cast("long").alias("score"),
        F.lit(False).alias("is_delete"),
    )
    deletes = docs.filter((d % 5 == 1) & (d % 3 != 0)).select(
        d.alias("k"),
        F.lit(None).cast("string").alias("val"),
        F.lit(None).cast("long").alias("score"),
        F.lit(True).alias("is_delete"),
    )
    # insert keys live in the negative range — disjoint from base keys
    # (doc_id >= 0) BY CONSTRUCTION at every scale factor, unlike the
    # old +1000000 offset which collided once a SF had >1M documents
    inserts = docs.filter(d % 7 == 2).select(
        (-d - 1).alias("k"),
        F.concat(F.lit("n"), (d % 100).cast("string")).alias("val"),
        F.lit(9).cast("long").alias("score"),
        F.lit(False).alias("is_delete"),
    )
    changes = updates.unionAll(deletes).unionAll(inserts)
    return merge_upsert(base, changes, key="k", payload=["val", "score"])


# CCNet-style line-level boilerplate corpus, closed-form in doc_id: a
# unique id line + a text-prefix line + planted recurring lines on
# coprime moduli ('Subscribe…' in half the docs — every 4th doc carries
# a CASE/PADDING variant so the normalized-key counting is pinned —
# 'All rights reserved 0/1' in a sixth each), an empty line every 7th
# doc (the blank-exemption branch), and a 'tail' content line.
_BOILER_CORPUS_SQL = """
      SELECT doc_id,
             'id: ' || doc_id || chr(10) || substr(text, 1, 40)
             || CASE WHEN doc_id % 2 = 0 THEN chr(10) ||
                  CASE WHEN doc_id % 4 = 0
                       THEN '  SUBSCRIBE TO OUR NEWSLETTER '
                       ELSE 'Subscribe to our newsletter' END
                ELSE '' END
             || CASE WHEN doc_id % 3 = 0
                THEN chr(10) || 'All rights reserved ' || (doc_id % 2)
                ELSE '' END
             || CASE WHEN doc_id % 7 = 2 THEN chr(10) ELSE '' END
             || chr(10) || 'tail ' || substr(text, 5, 30) AS text
      FROM documents
"""


def _boiler_corpus(spark, sf_dir) -> DataFrame:
    d = F.col("doc_id")
    return ptable(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("id: "),
            d.cast("string"),
            F.lit("\n"),
            F.substring("text", 1, 40),
            F.when(
                d % 2 == 0,
                F.when(
                    d % 4 == 0, F.lit("\n  SUBSCRIBE TO OUR NEWSLETTER ")
                ).otherwise(F.lit("\nSubscribe to our newsletter")),
            ).otherwise(F.lit("")),
            F.when(
                d % 3 == 0,
                F.concat(
                    F.lit("\nAll rights reserved "), (d % 2).cast("string")
                ),
            ).otherwise(F.lit("")),
            F.when(d % 7 == 2, F.lit("\n")).otherwise(F.lit("")),
            F.lit("\ntail "),
            F.substring("text", 5, 30),
        ).alias("text"),
    )


@q(
    "dd_boilerplate_report",
    f"""
    WITH corpus AS ({_BOILER_CORPUS_SQL}),
    keyed AS (
      SELECT doc_id, lower(trim(unnest(string_split(text, chr(10))))) AS line_key
      FROM corpus
    )
    SELECT line_key, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM keyed WHERE line_key <> ''
    GROUP BY line_key HAVING count(DISTINCT doc_id) >= 5
    """,
)
def dd_boilerplate_report(spark, sf_dir):
    """Discovery half of CCNet-style boilerplate removal
    (operators/dedup.py::frequent_lines): normalized lines (ASCII trim +
    lowercase) appearing in ≥5 DISTINCT documents of the derived
    multi-line corpus. The planted recurring lines (coprime moduli, one
    case/padding variant per 4th doc) guarantee a non-trivial frequent
    set whose counts pin the normalized-key semantics; any naturally
    recurring text-prefix lines are counted identically by the oracle.
    At 100 TB: posexplode + map-side-combinable groupBy on the line key
    — shuffle = distinct lines, output = the (tiny) boilerplate set."""
    from ..operators.dedup import frequent_lines

    return frequent_lines(_boiler_corpus(spark, sf_dir), min_docs=5)


@q(
    "dd_boilerplate_apply",
    f"""
    WITH corpus AS ({_BOILER_CORPUS_SQL}),
    lines AS (
      SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS line
      FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM corpus)
    ),
    keyed AS (
      SELECT doc_id, pos, line, lower(trim(line)) AS key FROM lines
    ),
    freq AS (
      SELECT key FROM keyed WHERE key <> ''
      GROUP BY key HAVING count(DISTINCT doc_id) >= 5
    ),
    marked AS (
      SELECT k.doc_id, k.pos, k.line,
             (f.key IS NULL OR k.key = '') AS kept
      FROM keyed k LEFT JOIN freq f ON k.key = f.key
    )
    SELECT doc_id,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE kept), '') AS clean_text,
           CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT) AS n_removed
    FROM marked GROUP BY doc_id
    """,
)
def dd_boilerplate_apply(spark, sf_dir):
    """Removal half (operators/dedup.py::remove_boilerplate_lines): drop
    every line whose normalized key is corpus-frequent (≥5 distinct
    docs), preserving order and original form of survivors; blank lines
    exempt; per-doc kept/removed counts audited. The every-4th-doc
    '  SUBSCRIBE … ' case variant must be removed by the NORMALIZED
    match while other docs' lowercase form is removed too — both
    branches exist under the oracle by construction. At 100 TB: the
    frequent set broadcasts into a left join and reassembly is a
    per-document groupBy (collect_list + array_sort, no window)."""
    from ..operators.dedup import remove_boilerplate_lines

    return remove_boilerplate_lines(_boiler_corpus(spark, sf_dir), min_docs=5)


from ..operators.unigram import DEFAULT_VOCAB as _UG_VOCAB  # noqa: E402

_UG_VOCAB_SQL = ", ".join(f"('{p}', {s})" for p, s in _UG_VOCAB.items())

# Shared oracle scaffold: enumerate every segmentation of every DISTINCT
# word via a recursive CTE over the scored vocab (integer micro-nats —
# exact arithmetic both engines), then pick per word by score DESC then
# lenkey ASC, where lenkey collates longer pieces first (chr(199 - len)
# per piece) — the operator's documented longest-first-piece tie-break
# (equivalence argument: tests/test_unigram.py docstring). Words are
# short and the vocab bounded, so enumeration is cheap and the planted
# exact tie ('ta'+'ble' == 'tab'+'le' on the corpus word 'table')
# exercises the tie-break under the oracle.
_UG_BEST_SQL = f"""
    vocab(piece, score) AS (SELECT * FROM (VALUES {{vals}})),
    t AS (SELECT doc_id, coalesce(lower(text), '') AS txt FROM documents),
    lists AS (
      SELECT doc_id, regexp_extract_all(txt, '[a-z0-9]+') AS ws FROM t
    ),
    words AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS word_idx, ws[u.i] AS word
      FROM lists, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) u
    ),
    uniq AS (SELECT DISTINCT word FROM words),
    paths(word, pos, score, lenkey, pieces) AS (
      SELECT word, 0, CAST(0 AS BIGINT), '', '' FROM uniq
      UNION ALL
      SELECT p.word, p.pos + length(v.piece), p.score + v.score,
             p.lenkey || chr(CAST(199 - length(v.piece) AS INTEGER)),
             CASE WHEN p.pieces = '' THEN v.piece
                  ELSE p.pieces || ' ' || v.piece END
      FROM paths p JOIN vocab v
        ON p.pos < length(p.word)
       AND substr(p.word, p.pos + 1, length(v.piece)) = v.piece
    ),
    best AS (
      SELECT word, pieces,
             row_number() OVER (PARTITION BY word
                                ORDER BY score DESC, lenkey ASC) AS rn
      FROM paths WHERE pos = length(word)
    )
"""


@q(
    "txt_unigram",
    "WITH RECURSIVE"
    + _UG_BEST_SQL.format(vals=_UG_VOCAB_SQL)
    + """
    SELECT w.doc_id, w.word_idx, w.word, b.pieces AS encoded
    FROM words w JOIN best b ON w.word = b.word AND b.rn = 1
    """,
)
def txt_unigram(spark, sf_dir):
    """Unigram-LM Viterbi subword encode (operators/unigram.py — the
    SentencePiece inference rule, Kudo 2018; completes the tokenizer
    triad after BPE and WordPiece). Pure JVM: the backward Viterbi DP
    is ONE ``F.aggregate`` per DISTINCT word (dictionary-encode + AQE
    join fan-out, the WordPiece r8 shape) whose per-cell candidate max
    is ``array_max`` over ``struct(score, k)`` — integer micro-nat
    scores, so no float DP divergence, and the struct order IS the
    documented longest-first-piece tie-break. The oracle ENUMERATES all
    segmentations per distinct word (recursive CTE over the same
    generated vocab literal) and picks by score DESC, longer-first
    lenkey ASC — a deliberately different algorithm arriving at the
    same contract. At 100 TB: distinct-word dictionary ≪ corpus
    (Zipf), encode cost is |dictionary| × |word|², fan-out is one
    broadcastable equi-join."""
    from ..operators.unigram import unigram_encode

    return unigram_encode(ptable(spark, sf_dir))


@q(
    "q_unigram_stats",
    "WITH RECURSIVE"
    + _UG_BEST_SQL.format(vals=_UG_VOCAB_SQL)
    + """
    , enc AS (
      SELECT w.doc_id, w.word,
             len(string_split(b.pieces, ' ')) AS n_pieces
      FROM words w JOIN best b ON w.word = b.word AND b.rn = 1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
           round(CAST(sum(n_pieces) AS DOUBLE) / count(*), 6) AS fertility,
           round(CAST(sum(length(word)) AS DOUBLE)
                 / nullif(sum(n_pieces), 0), 6) AS chars_per_piece
    FROM enc GROUP BY doc_id
    """,
)
def q_unigram_stats(spark, sf_dir):
    """Tokenizer evaluation report over the Unigram lane: per-doc word
    count, piece count, FERTILITY (pieces per word — Rust et al. 2021)
    and mean chars per piece (the compression the unigram objective
    actually optimizes). No UNK columns: the default vocab covers every
    [a-z0-9] char, so coverage is total by construction (the UNK branch
    is pinned in pytest with a crippled vocab instead). One groupBy
    over the dictionary-encoded Viterbi — same scale shape as
    ``txt_unigram``."""
    from ..operators.unigram import unigram_encode

    enc = unigram_encode(ptable(spark, sf_dir))
    n_pieces = F.size(F.split(F.col("encoded"), " "))
    return enc.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(n_pieces.cast("long")).alias("n_pieces"),
        F.round(
            F.sum(n_pieces.cast("long")).cast("double") / F.count("*"), 6
        ).alias("fertility"),
        F.round(
            F.sum(F.length("word").cast("long")).cast("double")
            / F.nullif(F.sum(n_pieces.cast("long")), F.lit(0)),
            6,
        ).alias("chars_per_piece"),
    )


# Snapshot-diff fixture: v2 of the documents corpus, closed-form in
# doc_id — every 7th doc removed, every remaining 5th doc's text
# revised, one added doc per 11th id (disjoint key range).
_V2_SQL = """
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN text || ' rev2' ELSE text END
               AS text,
             lang, source, n_chars
      FROM documents WHERE doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id,
             'new doc ' || doc_id AS text,
             'en' AS lang, 'src_new' AS source,
             CAST(8 + length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS n_chars
      FROM documents WHERE doc_id % 11 = 0
"""

_DIFF_HASH_SQL = """md5(concat_ws('|',
        coalesce(CAST(length(text) AS VARCHAR) || ':' || text, '&null'),
        coalesce(CAST(length(lang) AS VARCHAR) || ':' || lang, '&null'),
        coalesce(CAST(length(source) AS VARCHAR) || ':' || source, '&null'),
        coalesce(CAST(length(CAST(n_chars AS VARCHAR)) AS VARCHAR)
                 || ':' || CAST(n_chars AS VARCHAR), '&null')))"""


@q(
    "q_corpus_version_diff",
    f"""
    WITH v2 AS ({_V2_SQL}),
    o AS (SELECT doc_id, {_DIFF_HASH_SQL} AS old_hash FROM documents),
    n AS (SELECT doc_id, {_DIFF_HASH_SQL} AS new_hash FROM v2)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.old_hash IS NULL THEN 'added'
                WHEN n.new_hash IS NULL THEN 'removed'
                WHEN o.old_hash = n.new_hash THEN 'unchanged'
                ELSE 'changed' END AS status,
           o.old_hash, n.new_hash
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    """,
)
def q_corpus_version_diff(spark, sf_dir):
    """Dataset version delta (operators/merge.py::snapshot_diff — the
    audit a corpus release runs before publishing v(n+1), and the
    inverse of the MERGE/CDC lane q_merge_upsert; the operator-level
    sibling of the inline warehouse lane q_snapshot_diff): classify every key
    across two snapshots as added / removed / changed / unchanged via a
    null-safe length-prefixed content hash. The derived v2 plants all
    four branches on coprime moduli (7th removed, 5th revised, 11th
    added in a disjoint key range). At 100 TB: one full-outer hash join
    on the key — AQE-skew-handled, shuffle-free with bucketed
    snapshots; hashing is codegen md5/concat, no Python."""
    from ..operators.merge import snapshot_diff

    docs = ptable(spark, sf_dir)
    d = F.col("doc_id")
    v2 = docs.filter(d % 7 != 0).select(
        "doc_id",
        F.when(d % 5 == 0, F.concat(F.col("text"), F.lit(" rev2")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang", "source", "n_chars",
    ).unionByName(
        docs.filter(d % 11 == 0).select(
            (d + 10000000).alias("doc_id"),
            F.concat(F.lit("new doc "), d.cast("string")).alias("text"),
            F.lit("en").alias("lang"),
            F.lit("src_new").alias("source"),
            (F.lit(8) + F.length(d.cast("string"))).cast("long").alias("n_chars"),
        )
    )
    return snapshot_diff(docs, v2, key_cols="doc_id")
