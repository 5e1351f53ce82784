"""Property tests for the flexible-protocol (KIP-482) primitives and
the v9/v12/v7 codec pairs — encode∘decode must be identity for
arbitrary inputs, and uvarints must round-trip any uint."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ticdc_spark.codec import kafka_wire as kw
from ticdc_spark.codec.kafka_wire import Reader


@given(st.integers(min_value=0, max_value=(1 << 63) - 1))
def test_uvarint_roundtrip(v):
    assert Reader(kw.enc_uvarint(v)).uvarint() == v


@given(st.one_of(st.none(), st.text(max_size=200)))
def test_compact_string_roundtrip(s):
    assert Reader(kw.enc_compact_str(s)).compact_string() == s


@given(st.one_of(st.none(), st.binary(max_size=500)))
def test_compact_bytes_roundtrip(b):
    assert Reader(kw.enc_compact_bytes(b)).compact_bytes() == b


_topic = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Nd"),
                           whitelist_characters="-._"),
    min_size=1, max_size=40)


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(
    _topic,
    st.dictionaries(st.integers(0, 63), st.binary(min_size=61, max_size=200),
                    min_size=1, max_size=4),
    min_size=1, max_size=4),
    st.sampled_from([-1, 0, 1]))
def test_produce_v9_request_roundtrip(topic_data, acks):
    body = kw.enc_produce_request_v9(topic_data, acks=acks)
    txn, got_acks, _, got = kw.dec_produce_request_v9(Reader(body))
    assert txn is None and got_acks == acks and got == topic_data


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(
    _topic,
    st.dictionaries(st.integers(0, 63),
                    st.tuples(st.sampled_from([0, 2, 3, 45, 47]),
                              st.integers(-1, 1 << 40)),
                    min_size=1, max_size=4),
    min_size=1, max_size=4))
def test_produce_v9_response_roundtrip(results):
    body = kw.enc_produce_response_v9(results)
    assert kw.dec_produce_response_v9(Reader(body)) == results


@settings(max_examples=50, deadline=None)
@given(_topic, st.integers(0, 1 << 20), st.integers(0, 1 << 40),
       st.sampled_from([0, 1]))
def test_fetch_v12_request_roundtrip(topic, partition, offset, iso):
    body = kw.enc_fetch_request_v12(topic, partition, offset, isolation=iso)
    assert kw.dec_fetch_request_v12(Reader(body)) == (
        iso, [(topic, partition, offset, 1 << 26)])


@settings(max_examples=50, deadline=None)
@given(_topic, st.integers(0, 63), st.integers(0, 1 << 40),
       st.binary(max_size=300),
       st.integers(0, 1 << 40),
       st.lists(st.tuples(st.integers(0, 1 << 30), st.integers(0, 1 << 30)),
                max_size=3))
def test_fetch_v12_response_roundtrip(topic, partition, hw, rs, lso, aborted):
    body = kw.enc_fetch_response_v12(
        [(topic, partition, 0, hw, rs, lso, aborted)])
    assert kw.dec_fetch_response_v12(Reader(body)) == [
        (topic, partition, 0, hw, lso, aborted, rs)]


@settings(max_examples=50, deadline=None)
@given(_topic, st.integers(0, 63), st.integers(-2, 1 << 41))
def test_list_offsets_v7_roundtrip(topic, partition, ts):
    body = kw.enc_list_offsets_request_v7(topic, partition, ts)
    assert kw.dec_list_offsets_request_v7(Reader(body)) == [
        (topic, partition, ts)]
    resp = kw.enc_list_offsets_response_v7([(topic, partition, 0, ts, 7)])
    assert kw.dec_list_offsets_response_v7(Reader(resp)) == {
        (topic, partition): (ts, 7)}


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=1, max_size=30), st.integers(0, 1 << 40),
       st.integers(0, 1 << 14),
       st.dictionaries(_topic, st.lists(st.integers(0, 63), min_size=1,
                                        max_size=4), min_size=1, max_size=3),
       st.booleans())
def test_txn_codecs_roundtrip(txn_id, pid, epoch, tps, committed):
    body = kw.enc_add_partitions_to_txn_request(txn_id, pid, epoch, tps)
    assert kw.dec_add_partitions_to_txn_request(Reader(body)) == (
        txn_id, pid, epoch, tps)
    body = kw.enc_end_txn_request(txn_id, pid, epoch, committed)
    assert kw.dec_end_txn_request(Reader(body)) == (
        txn_id, pid, epoch, committed)


@given(st.sampled_from([kw.CONTROL_ABORT, kw.CONTROL_COMMIT]),
       st.integers(0, 1 << 30))
def test_control_record_roundtrip(marker, epoch):
    assert kw.dec_control_record(kw.enc_control_record(marker, epoch)) == marker
