"""csv encoder (SURVEY §2.11).

Reference: `pkg/sink/codec/csv/csv_message.go:104-246` — row layout
``[op, schema, table, commitTs, col1, col2, ...]`` where op ∈
{I,U,D}; quoting doubles the quote char; NULL renders as ``\\N``
(`pkgg/config/sink.go:278-279`); per-type rendering at
`csv_message.go:276-323`.

Update handling follows the csv protocol's "output old value" = false
default: updates emit the after image (deletes the before image).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, BinaryType, StringType, StructType

from ticdc_spark.functions.render import render_scalar

NULL_TOKEN = "\\N"
_DELIM = ","
_QUOTE = '"'

BINARY_ENCODING_METHODS = ("base64", "hex")


def _regex_literal(text: str) -> str:
    """Quote ``text`` as a Java regex literal (\\Q...\\E, with any
    embedded \\E sequence stitched through)."""
    return "\\Q" + text.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _escape_unquoted(col: Column, delimiter: str = _DELIM) -> Column:
    """Quote-less mode (`csv_message.go:209-243` formatWithEscapes):
    backslash, CR, LF, and the delimiter are backslash-escaped.

    The reference scans the RAW value once, left-to-right, matching the
    full delimiter at each position before the single-char escapes.  A
    chained-replace that escapes backslash first diverges when the
    delimiter contains a backslash (`a\\b` with delimiter ``\\`` must
    encode ``a\\\\b``, not quadruple) or when the delimiter collides
    with escape OUTPUT (delimiter ``rn`` must not re-match an escaped
    CR).  Equivalent single-pass construction WITHOUT a sentinel
    codepoint (a U+E000 sentinel corrupts a datum that legitimately
    contains it): ``split`` the RAW text on the full delimiter (regex
    split = the same greedy left-to-right, non-overlapping matching as
    the reference loop — `csv_message.go:215,230-236`, a lone '|' with
    delimiter '||' stays bare), backslash-escape the single chars
    inside each segment, then ``array_join`` with the per-char-escaped
    delimiter; escape OUTPUT is never rescanned for delimiter
    matches."""
    segments = F.split(col, _regex_literal(delimiter), -1)
    escaped_segments = F.transform(
        segments,
        lambda s: F.replace(
            F.replace(
                F.replace(s, F.lit("\\"), F.lit("\\\\")),
                F.lit("\r"), F.lit("\\r")),
            F.lit("\n"), F.lit("\\n")),
    )
    escaped_delim = "".join("\\" + ch for ch in delimiter)
    return F.array_join(escaped_segments, escaped_delim)


def _csv_field(col: Column, dtype, binary_encoding: str = "base64",
               quote: str | None = _QUOTE, delimiter: str = _DELIM,
               null_token: str = NULL_TOKEN) -> Column:
    if isinstance(dtype, BinaryType):
        # binary-encoding-method per `pkg/config/sink.go:283` /
        # `csv_message.go:276-323`: base64 or hex text rendering.
        if binary_encoding not in BINARY_ENCODING_METHODS:
            raise ValueError(f"unknown binary-encoding-method: {binary_encoding}")
        rendered = (
            F.base64(col) if binary_encoding == "base64" else F.hex(col)
        )
        return F.coalesce(rendered, F.lit(null_token))
    rendered = render_scalar(col, dtype)
    # vector (float array) renders to ``[v1,v2,...]`` text — a string
    # datum on the wire, so it takes string quoting/escaping (its commas
    # would otherwise break the row).
    if isinstance(dtype, (StringType, ArrayType)):
        if quote:
            txt = F.concat(
                F.lit(quote),
                F.replace(rendered, F.lit(quote), F.lit(quote + quote)),
                F.lit(quote),
            )
        else:
            txt = _escape_unquoted(rendered, delimiter)
        return F.coalesce(txt, F.lit(null_token))
    return F.coalesce(rendered, F.lit(null_token))


def encode_csv(
    cl: DataFrame,
    include_commit_ts: bool = True,
    binary_encoding: str = "base64",
    quote: str | None = _QUOTE,
    terminator: str | None = None,
    output_old_value: bool = False,
    delimiter: str = _DELIM,
    null_token: str = NULL_TOKEN,
) -> DataFrame:
    """Append a ``value`` column holding the csv message.

    ``quote=None`` selects the reference's quote-less escape mode
    (backslash escaping, `csv_message.go:209-243`).  ``terminator``
    (sink config, CRLF default in the reference `pkg/config/sink.go`)
    is appended per message when given — the csv/txt encoders terminate
    every line; ``None`` leaves the bare line (oracle-friendly).

    ``output_old_value`` ([sink.csv] output-old-value,
    `csv_message.go:104-141`): an extra unquoted is-updated boolean
    column follows commit-ts, and each UPDATE encodes as TWO lines in
    one message — the old image as a "D" row then the new image as an
    "I" row, both with is-updated=true (the reference builds both rows
    into one strings.Builder message).

    ``delimiter`` ([sink.csv] delimiter, 1-3 chars,
    `pkg/config/sink.go:275,311-324`) and ``null_token`` ([sink.csv]
    null, `sink.go:279`) follow the reference's CSVConfig."""
    schema: StructType = cl.schema["after"].dataType

    def line_for(op_col: Column, img: str, updated: Column | None):
        # Col1 op, Col2 TABLE name, Col3 SCHEMA name
        # (`csv_message.go:97-126` encodeMeta field order; the decoder
        # reads datums[1] as tableName, datums[2] as schemaName)
        fields: list[Column] = [
            _csv_field(op_col, StringType(), quote=quote, delimiter=delimiter),
            _csv_field(F.col("table_name"), StringType(), quote=quote,
                       delimiter=delimiter),
            _csv_field(F.col("schema_name"), StringType(), quote=quote,
                       delimiter=delimiter),
        ]
        if include_commit_ts:
            fields.append(F.col("commit_ts").cast("string"))
        if updated is not None:
            # Go fmt %v renders the bool bare: true/false, never quoted
            fields.append(updated)
        fields += [
            _csv_field(F.col(f"{img}.{f.name}"), f.dataType,
                       binary_encoding, quote=quote, delimiter=delimiter,
                       null_token=null_token)
            for f in schema.fields
        ]
        return F.concat_ws(delimiter, *fields)

    if not output_old_value:
        image = F.when(F.col("op") == "D",
                       F.col("before")).otherwise(F.col("after"))
        tmp = cl.withColumn("_img", image)
        line = line_for(F.col("op"), "_img", None)
        if terminator:
            line = F.concat(line, F.lit(terminator))
        return tmp.withColumn("value", line).drop("_img")

    sep = F.lit(terminator or "\r\n")
    is_upd = F.when(F.col("op") == "U",
                    F.lit("true")).otherwise(F.lit("false"))
    single_img = F.when(F.col("op") == "D",
                        F.col("before")).otherwise(F.col("after"))
    tmp = cl.withColumn("_img", single_img)
    single = line_for(F.col("op"), "_img", is_upd)
    pair = F.concat(line_for(F.lit("D"), "before", F.lit("true")), sep,
                    line_for(F.lit("I"), "after", F.lit("true")))
    value = F.when(F.col("op") == "U", pair).otherwise(single)
    if terminator:
        value = F.concat(value, F.lit(terminator))
    return tmp.withColumn("value", value).drop("_img")


def csv_encode_kwargs(csv_config: dict | None) -> dict:
    """[sink.csv] dict -> ``encode_csv`` keyword arguments — ONE place
    that consumes every CSVConfig field (`pkg/config/sink.go:270-290`).

    ``output-handle-key`` (`sink.go:287`) is parsed but NOT emitted —
    exactly the reference encoder, whose emit line is commented out
    behind log.Warn("not support output handle key")
    (`csv/csv_message.go:136-141,344-347`); parity is accept + warn +
    unchanged output.  ``output-field-header`` is consumed separately
    by the storage writer (``pipeline.storage_file_header``)."""
    import warnings

    c = csv_config or {}
    if c.get("output-handle-key"):
        warnings.warn("not support output handle key", stacklevel=2)
    return {
        "include_commit_ts": c.get("include-commit-ts", True),
        "binary_encoding": c.get("binary-encoding-method", "base64"),
        "quote": c.get("quote", '"') or None,  # "" selects escape mode
        "output_old_value": c.get("output-old-value", False),
        "delimiter": c.get("delimiter", ","),
        "null_token": c.get("null", "\\N"),
    }


def csv_header(
    schema: StructType,
    include_commit_ts: bool = True,
    output_old_value: bool = False,
    delimiter: str = _DELIM,
    terminator: str = "\r\n",
) -> str:
    """[sink.csv] output-field-header line (`csv_message.go:417-446`
    encodeHeader): meta columns then the payload column names, written
    once as the first line of each storage file
    (`csv_encoder.go:46-48` — emitted when the batch is empty).
    Plan-time string: the schema is known when the sink DAG compiles."""
    fields = ["ticdc-meta$operation", "ticdc-meta$table", "ticdc-meta$schema"]
    if include_commit_ts:
        fields.append("ticdc-meta$commit-ts")
    if output_old_value:
        fields.append("ticdc-meta$is-update")
    fields += [f.name for f in schema.fields]
    return delimiter.join(fields) + terminator
