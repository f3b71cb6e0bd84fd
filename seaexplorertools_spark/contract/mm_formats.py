"""Multimodal container/format lanes added in round 8 — TIFF, AIFF,
archive (ZIP/TAR) explosion, and the later format additions. Split out
of llm_quality.py when it hit the contract-module size budget.

Conventions: contract/_base.py; canonical key order: contract/_order.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from ._base import ORACLES, QUERIES, ptable, q, r6, r6p, table  # noqa: F401


@q(
    "mm_tiff_pixels",
    """
    WITH p AS (
      SELECT doc_id,
             doc_id % 200 AS a, doc_id % 4 AS b,
             8 + doc_id % 9 AS w, 5 + doc_id % 7 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(ch AS BIGINT) AS channels,
           a + b * (h - 1) / 2.0 + (ch - 1) / 2.0 AS mean_px,
           CAST(a AS BIGINT) AS min_px,
           CAST(a + b * (h - 1) + ch - 1 AS BIGINT) AS max_px
    FROM p
    """,
)
def mm_tiff_pixels(spark, sf_dir):
    """Baseline TIFF decode → pixel statistics under an EXACT oracle
    (operators/tiffcodec.py — the fifth codec in the image decode
    chain, after PNG/JPEG/GIF/BMP): documents_as_tiff writes REAL
    strip-organized TIFFs whose pixel value is ``a + b·y + c`` (row y,
    channel c), rotating byte order (II/MM), compression
    (none/PackBits) and strip layout (single/RowsPerStrip=4)
    independently of the value pattern — TIFF is lossless, the values
    stay < 256, and the mean is a multiple of 1/4 (IEEE-exact), so one
    constructor oracle pins the IFD walk, both endiannesses, the
    PackBits decoder and the multi-strip reassembly. native=False: the
    pure-python chain is the oracle authority. mapInPandas, zero
    shuffle, per-row degrade."""
    from ..operators.multimodal import documents_as_tiff, image_signal_features

    media = documents_as_tiff(ptable(spark, sf_dir))
    return image_signal_features(media, native=False)


@q(
    "mm_aiff_signal",
    """
    WITH d AS (
      SELECT doc_id, 64 + doc_id % 64 AS n,
             doc_id % 1000 - 500 AS a, doc_id % 7 - 3 AS b,
             8000 + (doc_id % 8) * 1000 AS rate
      FROM documents
    ),
    s AS (
      SELECT doc_id, n, rate, unnest(range(n)) AS i,
             a + b * unnest(range(n)) AS v
      FROM d
    ),
    c AS (
      SELECT doc_id, n, rate, i, v,
             lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
      FROM s
    )
    SELECT doc_id AS media_id, CAST(max(rate) AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS channels, CAST(max(n) AS BIGINT) AS n_frames,
           sqrt(CAST(sum(v * v) AS DOUBLE) / max(n)) AS rms,
           CAST(max(abs(v)) AS DOUBLE) AS peak,
           CAST(sum(CASE WHEN pv IS NOT NULL AND (v < 0) <> (pv < 0)
                         THEN 1 ELSE 0 END) AS DOUBLE)
             / (max(n) - 1) AS zero_cross_rate
    FROM c GROUP BY doc_id
    """,
)
def mm_aiff_signal(spark, sf_dir):
    """AIFF big-endian PCM decode → signal features
    (operators/aiff.py::decode_aiff_samples via the shared audio lane):
    documents_as_aiff reuses documents_as_flac's ramp derivations, so
    the SAME closed-form oracle that pins the FLAC decode pins the IFF
    chunk walk, the 80-bit extended-float sample-rate field and the
    big-endian sample path — a byte-order bug in any of them moves
    every statistic. Lossless ⇒ exact doubles. mapInPandas, zero
    shuffle, per-row degrade."""
    from ..operators.multimodal import documents_as_aiff, wav_signal_features

    media = documents_as_aiff(ptable(spark, sf_dir))
    return wav_signal_features(media)


@q(
    "mm_aiff_meta",
    """
    WITH d AS (
      SELECT doc_id, 64 + doc_id % 64 AS n,
             8000 + (doc_id % 8) * 1000 AS rate
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(54 + 2 * n AS BIGINT) AS n_bytes,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(1 AS BIGINT) AS channels,
           CAST(16 AS BIGINT) AS bits,
           CAST(n AS BIGINT) AS n_frames,
           CAST((n * 1000) // rate AS BIGINT) AS duration_ms
    FROM d
    """,
)
def mm_aiff_meta(spark, sf_dir):
    """AIFF COMM-chunk metadata through the audio sniff chain
    (multimodal.py::extract_audio_features, WAV → FLAC → MP3 → Ogg →
    AIFF): documents_as_aiff's container layout is fixed (FORM+type 12,
    COMM 8+18, SSND 8+8+2n bytes), so the payload size 54 + 2n and
    every COMM field — rate (through the 80-bit extended-float
    encoding), channels, bits, frame count, duration — are exact doc_id
    arithmetic. The metadata twin of mm_aiff_signal. mapInPandas, zero
    shuffle."""
    from ..operators.multimodal import documents_as_aiff, extract_audio_features

    media = documents_as_aiff(ptable(spark, sf_dir))
    return extract_audio_features(media)


@q(
    "mm_zip_records",
    """
    SELECT doc_id AS media_id, CAST(0 AS BIGINT) AS member_idx,
           'doc/' || doc_id || '/body.txt' AS name,
           CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes,
           coalesce(text, '') AS text
    FROM documents
    UNION ALL
    SELECT doc_id, 1, 'doc/' || doc_id || '/meta.txt',
           CAST(strlen('lang=' || lang) AS BIGINT), 'lang=' || lang
    FROM documents
    """,
)
def mm_zip_records(spark, sf_dir):
    """ZIP archive explosion (operators/archives.py::zip_records — the
    stdlib central-directory walk with per-member CRC-32 verification
    and an inflate cap): documents_as_zip packs each document into a
    real two-member archive, STORED for even doc_ids and DEFLATED for
    odd, so one constructor oracle pins both compression methods, the
    member ordering and the lossless byte round-trip. The archive twin
    of mm_warc_records. mapInPandas explode, zero shuffle, malformed
    archives degrade to zero rows."""
    from ..operators.archives import documents_as_zip, zip_records

    media = documents_as_zip(ptable(spark, sf_dir))
    return zip_records(media)


@q(
    "mm_tar_records",
    """
    SELECT doc_id AS media_id, CAST(0 AS BIGINT) AS member_idx,
           'doc/' || doc_id || '/body.txt' AS name,
           CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes,
           coalesce(text, '') AS text
    FROM documents
    UNION ALL
    SELECT doc_id, 1, 'doc/' || doc_id || '/meta.txt',
           CAST(strlen('lang=' || lang) AS BIGINT), 'lang=' || lang
    FROM documents
    """,
)
def mm_tar_records(spark, sf_dir):
    """TAR archive explosion (operators/archives.py::tar_records):
    same two-member fixture as mm_zip_records, but through the ustar
    header walk — plain tar for even doc_ids, gzip-compressed
    (transparent ``r:*`` detection) for odd, so the SAME oracle pins
    the 512-byte block framing, the size octal field and the gunzip
    branch. mapInPandas explode, zero shuffle, per-payload degrade."""
    from ..operators.archives import documents_as_tar, tar_records

    media = documents_as_tar(ptable(spark, sf_dir))
    return tar_records(media)


@q(
    "mm_avro_records",
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
           doc_id % 97 + seq / 8.0 AS score
    FROM s
    """,
)
def mm_avro_records(spark, sf_dir):
    """Avro Object Container File ingest (sources/avro.py): per
    document a REAL OCF — header metadata map with the embedded JSON
    schema, per-doc sync markers, 1 + doc_id % 3 records of
    (long, long, [null,string], double) — decoded by the pure-python
    block walk and exploded one row per record. Codec rotates
    null/deflate by doc_id parity and payloads with ≥ 2 records are
    written as TWO blocks, so one constructor oracle pins the varint/
    zigzag integers, the null-union branch (body NULL at seq 2), the
    raw-DEFLATE codec, the multi-block walk and the sync verification.
    Scores are dyadic (seq/8) ⇒ IEEE-exact. mapInPandas explode, zero
    shuffle, per-payload degrade."""
    from ..sources.avro import avro_records, documents_as_avro

    media = documents_as_avro(ptable(spark, sf_dir))
    return avro_records(media)


@q(
    "mm_m4a_meta",
    """
    WITH d AS (
      SELECT doc_id,
             CASE doc_id % 4 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                  WHEN 2 THEN 32000 ELSE 22050 END AS rate,
             1024 * (1 + doc_id % 5) AS n
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(518 + doc_id % 50 AS BIGINT) AS n_bytes,
           CAST(rate AS BIGINT) AS sample_rate,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST(16 AS BIGINT) AS bits,
           CAST(n AS BIGINT) AS n_frames,
           CAST((n * 1000) // rate AS BIGINT) AS duration_ms
    FROM d
    """,
)
def mm_m4a_meta(spark, sf_dir):
    """M4A/MP4 audio-track metadata through the audio sniff chain
    (videocontainers.py::parse_m4a_header — the 'soun'-handler twin of
    the mm_video_frames MP4 walk): documents_as_m4a writes a real
    ftyp+moov container whose mdhd timescale equals the sample rate, so
    frame count, duration, channels, bits and the 16.16 stsd rate are
    exact doc_id arithmetic, and the trailing 'free' pad box varies the
    byte count deterministically (518 + doc_id % 50). Completes the
    web-audio metadata family: WAV, FLAC, MP3 (CBR+VBR), Ogg
    (Opus+Vorbis), AIFF, M4A. mapInPandas, zero shuffle."""
    from ..operators.multimodal import documents_as_m4a, extract_audio_features

    media = documents_as_m4a(ptable(spark, sf_dir))
    return extract_audio_features(media)


@q(
    "mm_pdf_text",
    """
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t, 1 + doc_id % 3 AS k
      FROM documents
    ),
    s AS (SELECT doc_id, t, k, unnest(range(k)) AS i FROM d)
    SELECT doc_id AS media_id,
           CAST(max(k) AS BIGINT) AS n_pages,
           string_agg('Doc ' || doc_id || ' page ' || i || chr(10) || t,
                      chr(10) ORDER BY i) AS text
    FROM s GROUP BY doc_id
    """,
)
def mm_pdf_text(spark, sf_dir):
    """PDF text extraction (operators/pdfcodec.py): per document a
    REAL multi-page PDF (valid xref, shared font, Tj/T* content
    streams; FlateDecode on odd ids) built by encode_pdf, then parsed
    back by the object-scan extractor — page count from /Type /Page
    objects, text from the content-stream operator walk. The document
    text rides through the literal-string escape bijection (parens,
    backslashes, newlines), so a single constructor oracle pins the
    whole build→walk→inflate→operator-scan path including the page
    order and the T* line separators. mapInPandas, zero shuffle,
    per-row degrade."""
    from ..operators.pdfcodec import documents_as_pdf, pdf_text

    media = documents_as_pdf(ptable(spark, sf_dir))
    return pdf_text(media)


@q(
    "mm_docx_text",
    """
    SELECT doc_id AS media_id,
           CAST(2 + doc_id % 2 AS BIGINT) AS n_paragraphs,
           'Doc ' || doc_id || ' & <"notes">' || chr(10) || coalesce(text, '')
             || CASE WHEN doc_id % 2 = 1 THEN chr(10) || 'fin' ELSE '' END AS text
    FROM documents
    """,
)
def mm_docx_text(spark, sf_dir):
    """DOCX text extraction (operators/docx.py): per document a REAL
    Office Open XML package — [Content_Types], package rels, and a
    word/document.xml whose first paragraph carries &, < and " through
    the XML entity escaping — unpacked by the stdlib ZIP walk and
    scanned for <w:p>/<w:t> runs. ZIP and entity escaping are both
    lossless, so the constructor oracle pins the package walk, the run
    concatenation, the paragraph join and the entity decode (&amp;
    last). mapInPandas, zero shuffle, per-row degrade."""
    from ..operators.docx import documents_as_docx, docx_text

    media = documents_as_docx(ptable(spark, sf_dir))
    return docx_text(media)


@q(
    "mm_compressed_text",
    """
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'gzip' WHEN 1 THEN 'bzip2'
                ELSE 'xz' END AS codec,
           CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes,
           coalesce(text, '') AS text
    FROM documents
    """,
)
def mm_compressed_text(spark, sf_dir):
    """Transparent dump-file decompression
    (operators/archives.py::decompress_text): documents compressed
    with gzip / bzip2 / xz rotating on doc_id % 3, sniffed by magic and
    inflated under the member cap — all three codecs lossless, so one
    constructor oracle pins every sniff branch, the inflate byte count
    and the UTF-8 round-trip. The single-file twin of the WARC gzip
    path. mapInPandas, zero shuffle, per-row degrade."""
    from ..operators.archives import decompress_text, documents_as_compressed

    media = documents_as_compressed(ptable(spark, sf_dir))
    return decompress_text(media)


@q(
    "mm_msgpack_records",
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
def mm_msgpack_records(spark, sf_dir):
    """MessagePack dump ingest (sources/msgpack.py): per document a
    real concatenated-map stream — 1 + doc_id % 3 record maps plus a
    trailing bare-int value the lane must structurally skip — decoded
    by the pure-python wire walk (fixint→uint ladder, nil at seq 2,
    float64 scores, length-bounded strings) and exploded onto the fixed
    (doc_id, seq, body, score) shape. The schemaless twin of
    mm_avro_records, under the same constructor oracle pattern; scores
    are dyadic (seq/4) ⇒ IEEE-exact. mapInPandas explode, zero shuffle,
    per-payload degrade."""
    from ..sources.msgpack import documents_as_msgpack, msgpack_records

    media = documents_as_msgpack(ptable(spark, sf_dir))
    return msgpack_records(media)


@q(
    "mm_subtitle_cues",
    """
    WITH d AS (
      SELECT doc_id,
             replace(replace(coalesce(text, ''), chr(13), ' '), chr(10), ' ') AS t,
             1 + doc_id % 4 AS k
      FROM documents
    ),
    s AS (SELECT doc_id, t, unnest(range(k)) AS i FROM d)
    SELECT doc_id AS media_id,
           CAST(i AS BIGINT) AS cue_idx,
           CAST(i * 2000 + (doc_id % 5) * 100 AS BIGINT) AS start_ms,
           CAST(i * 2000 + (doc_id % 5) * 100 + 1500 AS BIGINT) AS end_ms,
           CASE WHEN i = 0 THEN t ELSE 'Cue ' || i END AS text
    FROM s
    """,
)
def mm_subtitle_cues(spark, sf_dir):
    """Subtitle/transcript ingest (operators/subtitles.py): per
    document a REAL subtitle file — SRT block framing for even ids,
    WebVTT (header + dot-milliseconds) for odd — exploded one row per
    cue. The timestamps are integer arithmetic formatted and re-parsed
    through HH:MM:SS±mmm in both dialects and cue 0 carries the
    document text, so one constructor oracle pins the block framing,
    both timing syntaxes and the text passthrough. mapInPandas explode,
    zero shuffle, per-payload degrade."""
    from ..operators.subtitles import documents_as_subtitles, subtitle_cues

    media = documents_as_subtitles(ptable(spark, sf_dir))
    return subtitle_cues(media)


@q(
    "mm_mbox_records",
    """
    WITH d AS (
      SELECT doc_id, replace(coalesce(text, ''), chr(13), ' ') AS t
      FROM documents
    )
    SELECT doc_id AS media_id, CAST(0 AS BIGINT) AS msg_idx,
           'user' || (doc_id % 40) || '@example.com' AS from_addr,
           'Thread ' || (doc_id % 17) AS subject,
           'Thu, 01 Jan 1970 00:00:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
             || ' +0000' AS date,
           t || chr(10) || 'From the archive' AS body
    FROM d
    UNION ALL
    SELECT doc_id, 1,
           'user' || ((doc_id + 1) % 40) || '@example.com',
           'Re: Thread ' || (doc_id % 17),
           'Thu, 01 Jan 1970 00:01:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
             || ' +0000',
           'reply to doc ' || doc_id
    FROM d
    """,
)
def mm_mbox_records(spark, sf_dir):
    """mbox mailing-list ingest (operators/mailbox.py): per document a
    real two-message mbox — a plain 7-bit message whose body carries
    the document text plus an mboxrd-stuffed ``>From `` line (the
    extractor must unstuff it, and the stuffing is what keeps the
    envelope split unambiguous), and a multipart/alternative reply
    whose text/plain leaf the MIME walk must pick over the text/html
    one. Headers are closed-form doc_id arithmetic, so one constructor
    oracle pins the envelope split, the stdlib header parse, the
    multipart selection and the unstuffing. mapInPandas explode, zero
    shuffle, per-payload degrade."""
    from ..operators.mailbox import documents_as_mbox, mbox_records

    media = documents_as_mbox(ptable(spark, sf_dir))
    return mbox_records(media)


@q(
    "mm_notebook_cells",
    """
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t FROM documents
    )
    SELECT doc_id AS media_id, CAST(0 AS BIGINT) AS cell_idx,
           'markdown' AS cell_type,
           '# Doc ' || doc_id || chr(10) || 'source ' || (doc_id % 9) AS source,
           CAST(2 AS BIGINT) AS n_lines
    FROM d
    UNION ALL
    SELECT doc_id, 1, 'code',
           'x = ' || doc_id || chr(10) || '# ' || t,
           2
    FROM d
    UNION ALL
    SELECT doc_id, 2, 'raw', '', 0 FROM d
    """,
)
def mm_notebook_cells(spark, sf_dir):
    """Jupyter notebook cell explosion (operators/notebooks.py): per
    document a real nbformat-4 JSON notebook — markdown cell with
    LIST-shaped source, code cell with STRING source carrying the
    document text through JSON escaping, raw cell with empty source —
    one row per cell with type and line count. JSON is lossless, so
    the constructor oracle pins the parse, both source shapes and the
    n_lines arithmetic. The code-corpus twin of the mm_zip_records
    ingest shape. mapInPandas explode, zero shuffle, per-payload
    degrade."""
    from ..operators.notebooks import documents_as_notebooks, notebook_cells

    media = documents_as_notebooks(ptable(spark, sf_dir))
    return notebook_cells(media)


@q(
    "q_chat_flatten",
    """
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t,
             CASE WHEN doc_id % 7 = 0 THEN 'dangling'
                  WHEN doc_id % 2 = 1 THEN 'extra' ELSE 'base' END AS kind
      FROM documents
    ),
    r AS (
      SELECT doc_id, t, kind,
        '<|system|>' || chr(10) || 'You are a helpful assistant.'
          || chr(10) || '<|end|>' || chr(10)
          || '<|user|>' || chr(10) || t || chr(10) || '<|end|>' || chr(10)
          || '<|assistant|>' || chr(10) || 'ack ' || doc_id || chr(10)
          || '<|end|>' AS base_r,
        'ack ' || doc_id AS a1,
        'detail ' || (doc_id % 13) AS a2
      FROM d
    )
    SELECT doc_id,
      CAST(CASE kind WHEN 'dangling' THEN 4 WHEN 'extra' THEN 5
           ELSE 3 END AS BIGINT) AS n_turns,
      kind <> 'dangling' AS valid,
      CASE kind
        WHEN 'dangling' THEN base_r || chr(10) || '<|user|>' || chr(10)
          || 'are you there?' || chr(10) || '<|end|>'
        WHEN 'extra' THEN base_r || chr(10) || '<|user|>' || chr(10)
          || 'more on ' || (doc_id % 13) || chr(10) || '<|end|>' || chr(10)
          || '<|assistant|>' || chr(10) || a2 || chr(10) || '<|end|>'
        ELSE base_r END AS rendered,
      CAST(CASE WHEN kind = 'extra' THEN length(a1) + length(a2)
           ELSE length(a1) END AS BIGINT) AS n_assistant_chars
    FROM r
    """,
)
def q_chat_flatten(spark, sf_dir):
    """Chat-transcript SFT prep (operators/chat.py) — the deliberately
    PURE-JVM lane: JSON transcripts are parsed with ``from_json``,
    validated with higher-order functions (known roles, one leading
    system turn, strict user/assistant alternation, assistant-final,
    non-empty content), rendered with the role-tag template via
    ``transform``+``concat_ws``, and the supervised-char budget summed
    with ``aggregate`` over a ``filter`` — zero Python workers, zero
    shuffle, one whole-stage-codegen projection. The fixture plants a
    dangling-user violation on doc_id % 7 == 0 so BOTH validity
    outcomes are oracle-pinned, and the fixture itself is built
    JVM-side with ``to_json``."""
    from ..operators.chat import chat_flatten, documents_as_transcripts

    tr = documents_as_transcripts(ptable(spark, sf_dir))
    return chat_flatten(tr).select(
        "doc_id", "n_turns", "valid", "rendered", "n_assistant_chars"
    )


@q(
    "q_robots_rules",
    """
    SELECT doc_id, CAST(1 AS BIGINT) AS group_id, '*' AS ua,
           'disallow' AS directive,
           '/private/' || (doc_id % 5) || '/' AS path
    FROM documents
    UNION ALL
    SELECT doc_id, 1, '*', 'allow', '/public/' FROM documents
    UNION ALL
    SELECT doc_id, 2, 'gptbot', 'disallow', '/' FROM documents
    WHERE doc_id % 3 <> 0
    UNION ALL
    SELECT doc_id, 2, 'ccbot', 'disallow', '/' FROM documents
    WHERE doc_id % 3 <> 0
    UNION ALL
    SELECT doc_id, -1, CAST(NULL AS VARCHAR), 'sitemap',
           'https://site' || (doc_id % 40) || '.example.com/sitemap-'
             || doc_id || '.xml'
    FROM documents
    """,
)
def q_robots_rules(spark, sf_dir):
    """robots.txt → denormalized rules table (operators/robots.py):
    the RFC-9309 group state machine as Spark primitives — posexplode
    lines, codegen regex directive split, group ids via a host-
    partitioned window (running sum of group starts, where a group
    starts at a User-agent line NOT preceded by another), then one
    (host, group) equi-join to fan rules out per user-agent. The
    fixture plants stacked User-agent lines (gptbot+ccbot — a wrong
    group-start predicate merges or splits them), an inline comment, a
    Crawl-delay line that must drop, and a group-independent Sitemap.
    All host-partitioned: one shuffle on the host key, no global
    ordering."""
    from ..operators.robots import documents_as_robots, robots_rules

    media = documents_as_robots(ptable(spark, sf_dir))
    return robots_rules(media)


@q(
    "q_robots_allowed",
    """
    WITH f AS (
      SELECT doc_id, '/private/' || (doc_id % 5) || '/x' AS path,
             doc_id % 3 = 0 AS star_group
      FROM documents
      UNION ALL
      SELECT doc_id, '/public/doc', doc_id % 3 = 0 FROM documents
      UNION ALL
      SELECT doc_id, '/other', doc_id % 3 = 0 FROM documents
    )
    SELECT doc_id, path,
           CASE WHEN NOT star_group THEN FALSE
                WHEN path = '/public/doc' THEN TRUE
                WHEN path = '/other' THEN TRUE
                ELSE FALSE END AS allowed
    FROM f
    """,
)
def q_robots_allowed(spark, sf_dir):
    """Longest-match fetch-permission join (RFC 9309 §2.2.2,
    operators/robots.py::robots_allowed): a 3-path frontier per host
    joins the host's rules for ua='gptbot' — hosts WITH a gptbot group
    (doc_id % 3 ≠ 0) use it (Disallow / ⇒ everything blocked), hosts
    without fall back to the '*' group (longest-prefix pick between
    /private/<k>/ disallow, /public/ allow, and the default-allow
    no-match case). One host-keyed join + one argmax aggregation —
    the decision never leaves the executors."""
    from ..operators.robots import (
        documents_as_robots,
        robots_allowed,
        robots_rules,
    )
    from pyspark.sql import functions as F

    docs = ptable(spark, sf_dir)
    rules = robots_rules(documents_as_robots(docs))
    frontier = docs.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat(F.lit("/private/"), (F.col("doc_id") % 5).cast("string"), F.lit("/x")),
                F.lit("/public/doc"),
                F.lit("/other"),
            )
        ).alias("path"),
    )
    return robots_allowed(rules, frontier, ua="gptbot")


@q(
    "q_sitemap_urls",
    """
    WITH u AS (
      SELECT doc_id, unnest(range(1 + doc_id % 4)) AS i
      FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT doc_id, CAST(i AS BIGINT) AS entry_idx,
           'https://site' || (doc_id % 40) || '.example.com/page/'
             || doc_id || '-' || i AS loc,
           CASE WHEN i % 2 = 0
                THEN '20' || lpad(CAST((doc_id + i) % 30 AS VARCHAR), 2, '0')
                     || '-01-15' END AS lastmod,
           CASE WHEN i % 3 = 0
                THEN CAST('0.' || ((doc_id + i) % 9 + 1) AS DOUBLE) END AS priority,
           FALSE AS is_index
    FROM u
    UNION ALL
    SELECT doc_id, 0,
           'https://site' || (doc_id % 40) || '.example.com/sitemap-a.xml',
           NULL, NULL, TRUE
    FROM documents WHERE doc_id % 5 = 0
    UNION ALL
    SELECT doc_id, 1,
           'https://site' || (doc_id % 40) || '.example.com/sitemap-b.xml',
           NULL, NULL, TRUE
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def q_sitemap_urls(spark, sf_dir):
    """Sitemap explosion (operators/markup.py::sitemap_urls) — the
    crawl-frontier feed, pure codegen: regexp_extract_all over <url>
    (or <sitemap> for a sitemapindex, doc_id % 5 == 0) blocks + one
    posexplode; lastmod/priority optional per entry. Pairs with
    q_robots_rules (which surfaces the Sitemap pointers) and
    txt_url_canon (which keys the frontier). Zero Python, one explode,
    no shuffle."""
    from ..operators.markup import documents_as_sitemaps, sitemap_urls

    media = documents_as_sitemaps(ptable(spark, sf_dir))
    return sitemap_urls(media)


@q(
    "mm_svg_meta",
    """
    SELECT doc_id,
           CAST(10 + doc_id % 90 AS DOUBLE) AS width,
           CAST(5 + doc_id % 45 AS DOUBLE) AS height,
           CAST(0 AS DOUBLE) AS vb_x, CAST(0 AS DOUBLE) AS vb_y,
           CAST(10 + doc_id % 90 AS DOUBLE) AS vb_w,
           CAST(5 + doc_id % 45 AS DOUBLE) AS vb_h,
           CAST(doc_id % 4 AS BIGINT) AS n_paths,
           CAST(1 AS BIGINT) AS n_rects,
           CAST(doc_id % 2 AS BIGINT) AS n_circles,
           coalesce(text, '') || ' tail' AS text
    FROM documents
    """,
)
def mm_svg_meta(spark, sf_dir):
    """SVG markup metadata (operators/markup.py::svg_meta) — vector
    images are markup, not pixels: unit-stripped ("px") width/height
    from the root tag only (the [^>]* anchor cannot cross into child
    elements' width attributes), the viewBox quad, per-element counts,
    and <text> content with inner <tspan> tags stripped. The document
    text rides through the text extraction. Pure codegen projection,
    zero Python, zero shuffle."""
    from ..operators.markup import documents_as_svg, svg_meta

    media = documents_as_svg(ptable(spark, sf_dir))
    return svg_meta(media)


@q(
    "mm_ico_pixels",
    """
    WITH p AS (
      SELECT doc_id,
             doc_id % 180 AS a, doc_id % 3 AS b,
             4 + doc_id % 9 AS w, 3 + doc_id % 7 AS h,
             CASE WHEN doc_id % 2 = 0 THEN 4 ELSE 3 END AS ch
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(ch AS BIGINT) AS channels,
           a + b * (h - 1) / 2.0 + (ch - 1) / 2.0 AS mean_px,
           CAST(a AS BIGINT) AS min_px,
           CAST(a + b * (h - 1) + ch - 1 AS BIGINT) AS max_px
    FROM p
    """,
)
def mm_ico_pixels(spark, sf_dir):
    """ICO (favicon) decode → pixel statistics
    (operators/icocodec.py, the seventh image container after
    PNG/JPEG/GIF/BMP/TIFF/WebP-dims): each fixture is a real two-entry
    ICO whose 2×2 decoy must LOSE the largest-entry pick; even ids
    store the real image as a 32-bpp bottom-up BGRA DIB (decoded RGBA,
    channels 4 — the swizzle and flip move mean/min/max if wrong),
    odd ids as an embedded PNG (channels 3, routed through the
    existing PNG codec). Means are multiples of 1/4 ⇒ IEEE-exact.
    native=False: pure-python oracle authority. mapInPandas, zero
    shuffle, per-row degrade."""
    from ..operators.icocodec import documents_as_ico
    from ..operators.multimodal import image_signal_features

    media = documents_as_ico(ptable(spark, sf_dir))
    return image_signal_features(media, native=False)


@q(
    "mm_epub_text",
    """
    WITH d AS (
      SELECT doc_id,
             replace(replace(coalesce(text, ''), chr(13), ' '), chr(10), ' ') AS t,
             1 + doc_id % 3 AS k
      FROM documents
    ),
    s AS (
      SELECT doc_id, k, unnest(range(k)) AS i,
             'Chapter ' || unnest(range(k)) || '.'
               || CASE WHEN unnest(range(k)) = 0 AND t <> ''
                       THEN ' ' || t ELSE '' END AS ch
      FROM d
    )
    SELECT doc_id AS media_id,
           CAST(max(k) AS BIGINT) AS n_chapters,
           'Book ' || doc_id || ' & Co.' AS title,
           string_agg(ch, chr(10) ORDER BY i) AS text
    FROM s GROUP BY doc_id
    """,
)
def mm_epub_text(spark, sf_dir):
    """EPUB extraction (operators/epub.py): per document a REAL EPUB
    package — stored mimetype, container.xml → OPF discovery,
    dc:title with an entity round-trip ('&'), a relative-href manifest
    and an ordered spine of XHTML chapters (chapter 0 carries the
    document text inside a <p>, heads/styles must be dropped). ZIP and
    XML escaping are lossless, so the constructor oracle pins the
    whole container chain, the spine ORDER and the chapter text
    decode. The books twin of mm_pdf_text/mm_docx_text. mapInPandas,
    zero shuffle, per-row degrade."""
    from ..operators.epub import documents_as_epub, epub_text

    media = documents_as_epub(ptable(spark, sf_dir))
    return epub_text(media)


@q(
    "mm_arrow_records",
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
           doc_id % 83 + seq / 16.0 AS score
    FROM s
    """,
)
def mm_arrow_records(spark, sf_dir):
    """Arrow IPC ingest (sources/arrow_ipc.py): per document a real
    IPC payload — the STREAMING format for even ids, the FILE/ARROW1
    (Feather-V2) format for odd, two record batches whenever a payload
    holds ≥ 2 rows, a NULL body at seq 2 and dyadic scores — exploded
    onto the fixed (doc_id, seq, body, score) ingest shape shared with
    mm_avro_records / mm_msgpack_records. One constructor oracle pins
    the magic sniff, both readers and the batch walk. mapInPandas
    explode, zero shuffle, per-payload degrade."""
    from ..sources.arrow_ipc import arrow_records, documents_as_arrow

    media = documents_as_arrow(ptable(spark, sf_dir))
    return arrow_records(media)


@q(
    "txt_markdown_meta",
    """
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t,
             CASE doc_id % 4 WHEN 0 THEN 'mit' WHEN 1 THEN 'apache-2.0'
                  WHEN 2 THEN 'cc-by-4.0' ELSE 'unlicense' END AS lic,
             doc_id % 7 = 0 AS bare
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN bare THEN NULL ELSE 'Doc ' || doc_id END AS title,
           CASE WHEN bare THEN NULL ELSE lic END AS license,
           CAST(1 + least(doc_id % 3, 2) AS BIGINT) AS n_headings,
           CAST(1 AS BIGINT) AS n_links,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_code_blocks,
           '# H0' || chr(10)
             || CASE WHEN doc_id % 3 >= 1 THEN '## H1' || chr(10) ELSE '' END
             || CASE WHEN doc_id % 3 >= 2 THEN '### H2' || chr(10) ELSE '' END
             || t || chr(10) || 'see [link](https://example.com/'
             || doc_id || ')' || chr(10)
             || CASE WHEN doc_id % 2 = 0
                     THEN '```py' || chr(10) || 'x = 1' || chr(10) || '```' || chr(10)
                     ELSE '' END AS body
    FROM d
    """,
)
def txt_markdown_meta(spark, sf_dir):
    """Markdown + YAML-front-matter metadata
    (operators/markup.py::markdown_meta) — pure codegen: the leading
    ``---`` fence pair yields title/license (quoted title unquoted,
    the list-valued ``tags:`` field correctly ignored by the flat
    parser), ids divisible by 7 have NO front matter (NULL branch +
    whole-payload body), and the body profile counts ATX headings,
    links and fenced code blocks. Zero Python, zero shuffle."""
    from ..operators.markup import documents_as_markdown, markdown_meta

    media = documents_as_markdown(ptable(spark, sf_dir))
    return markdown_meta(media)


@q(
    "mm_protobuf_fields",
    """
    WITH d AS (
      SELECT doc_id, coalesce(text, '') AS t,
             CASE WHEN doc_id % 9 = 0 AND doc_id > 0
                  THEN -doc_id ELSE doc_id END AS v1,
             doc_id % 1000 - 500 AS v3,
             doc_id % 77 AS v4
      FROM documents
    )
    SELECT doc_id AS media_id, CAST(0 AS BIGINT) AS field_idx,
           CAST(1 AS BIGINT) AS field_no, CAST(0 AS BIGINT) AS wire_type,
           CAST(v1 AS BIGINT) AS varint,
           CAST(CASE
             WHEN doc_id = 0 THEN 0
             WHEN doc_id % 9 <> 0 THEN
               CASE WHEN doc_id % 2 = 0 THEN doc_id // 2
                    ELSE -((doc_id + 1) // 2) END
             WHEN doc_id % 2 = 0 THEN (9223372036854775807 - doc_id // 2) + 1
             ELSE ((doc_id + 1) // 2 - 1 - 9223372036854775807) - 1
           END AS BIGINT) AS zigzag,
           CAST(NULL AS BIGINT) AS fixed_long,
           CAST(NULL AS DOUBLE) AS fixed_double,
           CAST(NULL AS BIGINT) AS n_bytes,
           CAST(NULL AS VARCHAR) AS text
    FROM d
    UNION ALL
    SELECT doc_id, 1, 2, 2, NULL, NULL, NULL, NULL,
           CAST(strlen(t) AS BIGINT), t
    FROM d
    UNION ALL
    SELECT doc_id, 2, 3, 1, NULL, NULL, CAST(v3 AS BIGINT),
           CASE WHEN v3 >= 0 THEN v3 * pow(2.0, -1074) END,
           NULL, NULL
    FROM d
    UNION ALL
    SELECT doc_id, 3, 4, 5, NULL, NULL, CAST(v4 AS BIGINT),
           v4 * pow(2.0, -149), NULL, NULL
    FROM d
    UNION ALL
    SELECT doc_id, 4, 5, 2, NULL, NULL, NULL, NULL, 3, NULL
    FROM d
    """,
)
def mm_protobuf_fields(spark, sf_dir):
    """Protobuf wire-format walk (sources/protowire.py) — the
    schemaless field extraction a service-log corpus gets WITHOUT its
    .proto: tag split, varint (two's-complement + zigzag readings,
    incl. the 10-byte negative form on ids divisible by 9 — the
    zigzag closed form crosses ±2^63 and pins 64-bit wrap exactly),
    length-delimited bytes (UTF-8 text surfaced only when it decodes:
    the planted 0xFF 0xFE blob must yield NULL text with n_bytes 3),
    and fixed64/fixed32 in both integer and finite-double readings
    (the small-int fixtures reinterpret as EXACT denormals; negative
    fixed64 bit patterns are NaN and surface NULL by the lane's
    finite-only contract). mapInPandas explode, zero shuffle,
    per-payload degrade."""
    from ..sources.protowire import documents_as_protobuf, pb_fields

    media = documents_as_protobuf(ptable(spark, sf_dir))
    return pb_fields(media)


@q(
    "mm_adts_meta",
    """
    WITH d AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 48000 WHEN 1 THEN 44100
                  ELSE 32000 END AS sr,
             1 + doc_id % 2 AS ch,
             2 + doc_id % 5 AS nf,
             (CASE WHEN doc_id % 4 = 0 THEN 9 ELSE 7 END)
               + 100 + doc_id % 50 AS flen,
             doc_id % 7 = 3 AS trunc
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(nf * flen - CASE WHEN trunc THEN 1 ELSE 0 END
                AS BIGINT) AS n_bytes,
           CASE WHEN trunc THEN NULL
                ELSE CAST(sr AS BIGINT) END AS sample_rate,
           CASE WHEN trunc THEN NULL
                ELSE CAST(ch AS BIGINT) END AS channels,
           CAST(NULL AS BIGINT) AS bits,
           CASE WHEN trunc THEN NULL
                ELSE CAST(nf * 1024 AS BIGINT) END AS n_frames,
           CASE WHEN trunc THEN NULL
                ELSE CAST((nf * 1024 * 1000) // sr AS BIGINT)
                END AS duration_ms
    FROM d
    """,
)
def mm_adts_meta(spark, sf_dir):
    """ADTS/AAC frame-header metadata over REAL AAC-LC streams
    (operators/aac.py::parse_adts_header via extract_audio_features —
    the web-audio container the WAV/FLAC/MP3/Ogg/AIFF/M4A chain was
    missing): the sync walk validates every frame header (0xFFF sync +
    layer 00), chains 13-bit frame lengths to EOF, handles both the
    7-byte protection_absent and 9-byte CRC header (ids % 4 == 0), and
    sums 1024 samples per raw data block. documents_as_adts streams
    are closed-form in doc_id, with ids % 7 == 3 truncated one byte so
    the strict-walk rejection branch (NULL metadata, byte count still
    real) exists under the oracle. At 100 TB: zero-shuffle Arrow
    mapInPandas, header-only walk — cost is frames × O(1), payload
    bytes never touched."""
    from ..operators.aac import documents_as_adts
    from ..operators.multimodal import extract_audio_features

    media = documents_as_adts(ptable(spark, sf_dir))
    return extract_audio_features(media)
