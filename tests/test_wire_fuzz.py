"""Adversarial robustness for the sink wire codecs (H17/H18/H19):
hostile bytes through the decode paths must raise cleanly (never
hang, never silently mis-parse) — the same contract the image/audio
codec fuzz battery pins, applied to the broker-facing decoders."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timescaledb_event_streamer_spark.sinks.kafka_wire import (
    decode_produce_request,
    decode_produce_response,
    decode_record_batch,
    decode_varint,
    encode_produce_request,
    encode_record_batch,
)
from timescaledb_event_streamer_spark.sinks.nats_wire import (
    decode_nkey_seed,
    parse_headers,
)
from timescaledb_event_streamer_spark.sinks.redis_delivery import RespReader


_CLEAN = (ValueError, struct.error, IndexError, ConnectionError)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_record_batch_hostile_bytes(payload):
    try:
        out = decode_record_batch(payload)
    except _CLEAN:
        return
    assert isinstance(out, dict) and "records" in out


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_record_batch_truncations_raise(data):
    batch = encode_record_batch(
        [(b"k", b"v" * 20, 1_700_000_000_000), (None, b"w", 1_700_000_000_001)]
    )
    cut = data.draw(st.integers(min_value=0, max_value=len(batch) - 1))
    with pytest.raises(_CLEAN):
        decode_record_batch(batch[:cut])


@settings(max_examples=100, deadline=None)
@given(st.data())
def test_produce_request_bitflip_never_hangs(data):
    frame = bytearray(
        encode_produce_request(
            1, "cid", {"t": {0: encode_record_batch([(b"k", b"v", 5)])}}
        )
    )
    i = data.draw(st.integers(min_value=0, max_value=len(frame) - 1))
    frame[i] ^= data.draw(st.integers(min_value=1, max_value=255))
    try:
        req = decode_produce_request(bytes(frame))
        for parts in req["topics"].values():
            for batch in parts.values():
                if batch:
                    decode_record_batch(batch)
    except _CLEAN:
        return


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_produce_response_hostile_bytes(payload):
    try:
        decode_produce_response(payload)
    except _CLEAN:
        return


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=32))
def test_varint_hostile_bytes(data):
    try:
        v, pos = decode_varint(data, 0)
        assert 0 < pos <= len(data)
    except _CLEAN:
        return


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=64))
def test_nkey_seed_hostile_text(seed):
    try:
        raw = decode_nkey_seed(seed)
        assert len(raw) == 32
    except (ValueError,):
        return


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=128))
def test_nats_header_block_hostile_bytes(hdr):
    out = parse_headers(hdr)  # tolerant by design: returns a dict
    assert isinstance(out, dict)


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=1, max_size=128))
def test_resp_reader_hostile_bytes(payload):
    class Feed:
        def __init__(self, data):
            self.data = data

        def recv(self, n):
            out, self.data = self.data[:n], self.data[n:]
            return out

    r = RespReader(Feed(payload))
    try:
        r.next_reply()
    except (_CLEAN + (UnicodeDecodeError,)):
        return
