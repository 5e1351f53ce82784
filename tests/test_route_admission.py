"""Route admission state machine (`operators/route_admission.py`,
`pkg/routing/admin.go` twin): conflict detection, atomic replacement,
commit-order serialization, resend idempotence, schema release."""

from __future__ import annotations

import pytest

from ticdc_spark.operators.route_admission import (
    ADMIT,
    RELEASE,
    RELEASE_SCHEMA,
    Admission,
    RouteAdmin,
    RouteBinding,
    TableRouteConflict,
    TargetTableRegistry,
)


def _b(ss, st, ts_, tt):
    return RouteBinding(source=(ss, st), target=(ts_, tt))


def _merge_route(schema, table):
    # every source table routes to ONE merged target table
    return RouteBinding(source=(schema, table), target=("sink", "merged"))


def _ident_route(schema, table):
    return RouteBinding(source=(schema, table), target=(schema, table))


# -- registry ----------------------------------------------------------------

def test_registry_rejects_second_owner():
    r = TargetTableRegistry()
    r.apply_transition([], [_b("s", "a", "d", "t")], True)
    with pytest.raises(TableRouteConflict):
        r.apply_transition([], [_b("s", "b", "d", "t")], True)
    # validation is side-effect free: the registry still has one entry
    assert r.source2target == {("s", "a"): ("d", "t")}


def test_registry_atomic_replacement():
    """rename/drop-and-create: the old owner released IN THE SAME
    transition lets the new source claim the target
    (`registry.go:66-70`)."""
    r = TargetTableRegistry()
    r.apply_transition([], [_b("s", "a", "d", "t")], True)
    r.apply_transition([("s", "a")], [_b("s", "a2", "d", "t")], True)
    assert r.target2source[("d", "t")] == ("s", "a2")


def test_registry_two_new_adds_conflict():
    r = TargetTableRegistry()
    with pytest.raises(TableRouteConflict):
        r.apply_transition(
            [], [_b("s", "a", "d", "t"), _b("s", "b", "d", "t")], True)


def test_registry_same_source_re_add_ok():
    r = TargetTableRegistry()
    r.apply_transition([], [_b("s", "a", "d", "t")], True)
    r.apply_transition([], [_b("s", "a", "d", "t")], True)  # no-op claim


# -- admin -------------------------------------------------------------------

def test_seed_conflict_raises():
    with pytest.raises(TableRouteConflict):
        RouteAdmin(_merge_route, [("s", "a"), ("s", "b")])


def test_commit_order_serialization():
    """A later transition prechecks False until every earlier one is
    applied (`admin.go:155-157`)."""
    errors = []
    adm = RouteAdmin(_ident_route, [("s", "a")], report_error=errors.append)
    t1 = [Admission(ADMIT, ("s", "b"), _b("s", "b", "s", "b"))]
    t2 = [Admission(ADMIT, ("s", "c"), _b("s", "c", "s", "c"))]
    # ts 10 is pending (prechecked, not yet applied): ts 20 must wait —
    # the smallest unapplied commit ts owns the queue head
    assert adm.precheck(10, t1) is True
    assert adm.precheck(20, t2) is False
    assert adm.apply(10, t1) is True
    assert adm.precheck(20, t2) is True
    assert adm.apply(20, t2) is True
    assert errors == []
    # recovery path: a LATER ts discovered first prechecks True (it is
    # the queue head) but re-sorts behind an earlier one on discovery
    adm2 = RouteAdmin(_ident_route, [])
    assert adm2.precheck(40, t2) is True   # alone: head of the queue
    assert adm2.precheck(30, t1) is True   # sorts ahead of 40
    assert adm2.precheck(40, t2) is False  # now blocked behind 30
    assert adm2.apply(30, t1) is True
    assert adm2.apply(40, t2) is True


def test_resend_idempotent():
    adm = RouteAdmin(_ident_route, [])
    t = [Admission(ADMIT, ("s", "x"), _b("s", "x", "s", "x"))]
    assert adm.apply(5, t) is True
    # barrier resend: both paths short-circuit as applied
    assert adm.precheck(5, t) is True
    assert adm.apply(5, t) is True
    assert adm.last_applied_commit_ts == 5


def test_conflict_reports_once():
    errors = []
    adm = RouteAdmin(_merge_route, [("s", "a")], report_error=errors.append)
    bad = [Admission(ADMIT, ("s", "b"), _merge_route("s", "b"))]
    assert adm.precheck(10, bad) is False
    assert adm.precheck(10, bad) is False  # resend of the broken state
    assert len(errors) == 1  # `admin.go:fail` suppresses duplicates


def test_atomic_rename_through_admin():
    adm = RouteAdmin(_ident_route, [("s", "a")])
    t = [
        Admission(RELEASE, ("s", "a")),
        Admission(ADMIT, ("s", "a2"), _b("s", "a2", "s", "a")),
    ]
    assert adm.precheck(7, t) is True
    assert adm.apply(7, t) is True
    assert adm.active_routes[("s", "a2")].target == ("s", "a")
    assert ("s", "a") not in adm.active_routes


def test_release_schema_expands_against_snapshot():
    adm = RouteAdmin(_ident_route, [("s", "a"), ("s", "b"), ("z", "c")])
    t = [Admission(RELEASE_SCHEMA, ("s", ""))]
    assert adm.apply(3, t) is True
    assert set(adm.active_routes) == {("z", "c")}
    # freed targets are claimable again
    t2 = [Admission(ADMIT, ("q", "n"), _b("q", "n", "s", "a"))]
    assert adm.apply(4, t2) is True


def test_random_sequences_match_naive_model():
    """Property: for random commit-ordered admission sequences, the
    Admin's final active-route snapshot equals a naive sequential model
    (dict + same-transition conflict rule), and both agree on which
    transitions were rejected."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sources = [("s", f"t{i}") for i in range(4)]
    targets = [("d", f"x{i}") for i in range(3)]

    adm_strategy = st.lists(
        st.tuples(st.sampled_from(["admit", "release"]),
                  st.sampled_from(sources),
                  st.sampled_from(targets)),
        min_size=1, max_size=3)

    @settings(max_examples=40, deadline=None)
    @given(st.lists(adm_strategy, min_size=1, max_size=6))
    def check(batches):
        admin = RouteAdmin(_ident_route, [])
        naive_s2t: dict = {}
        naive_t2s: dict = {}
        for i, batch in enumerate(batches):
            ts = (i + 1) * 10
            admissions = [
                Admission(ADMIT, src, RouteBinding(src, tgt))
                if act == "admit" else Admission(RELEASE, src)
                for act, src, tgt in batch
            ]
            ok = admin.apply(ts, admissions)
            # naive: validate against post-release state; both new adds
            # to one target conflict
            releases = [a.source for a in admissions
                        if a.action == RELEASE]
            adds = [a.binding for a in admissions if a.action == ADMIT]
            after_rel_t2s = {t: s for t, s in naive_t2s.items()
                            if s not in releases}
            valid = True
            seen_t: dict = {}
            for b in adds:
                if after_rel_t2s.get(b.target, b.source) != b.source:
                    valid = False
                if seen_t.get(b.target, b.source) != b.source:
                    valid = False
                seen_t[b.target] = b.source
            if valid:
                for s in releases:
                    t = naive_s2t.pop(s, None)
                    if t is not None:
                        naive_t2s.pop(t, None)
                for b in adds:
                    naive_t2s[b.target] = b.source
                    naive_s2t[b.source] = b.target
            if ok != valid:
                raise AssertionError(
                    f"batch {i}: admin={ok} naive={valid} {batch}")
            if not ok:
                return  # admin latches failed; stop like the changefeed
            assert dict(admin.registry.source2target) == naive_s2t

    check()
