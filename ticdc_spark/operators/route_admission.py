"""Table-route admission control — `pkg/routing/admin.go` +
`pkg/routing/registry.go`.

When dispatch rules rename tables downstream, two live source tables
must never route to the same target: the replicated target would
interleave two changelogs.  The reference guards this with a
driver-side admission state machine fed by DDL barrier events in
commit-ts order:

- **TargetTableRegistry** (`registry.go:59-118`): bidirectional
  source↔target index; a transition's adds are validated against the
  current owners BEFORE any mutation.  A target owned by another source
  can only be claimed if that owner is released *in the same
  transition* (atomic rename/drop-and-create replacement); two adds in
  one transition can't claim the same target either.
- **Admin** (`admin.go:27-268`): pending transitions keyed by DDL
  commit ts, applied strictly in commit order (the smallest unapplied
  ts is always the queue head — resend/recovery may discover them out
  of arrival order).  ``precheck`` validates without mutating and
  returns False while an earlier transition is still unapplied;
  ``apply`` mutates and advances.  ``last_applied_commit_ts`` makes
  both idempotent across barrier resends.  ReleaseSchema expands
  against the live snapshot at evaluation time.  Errors report once
  (resends of a broken state stay quiet).

Control-plane component: state is O(n_tables) names on the driver, the
same place the reference's maintainer keeps it.
"""
from __future__ import annotations

from dataclasses import dataclass

TableKey = tuple[str, str]  # (schema, table)

ADMIT = "admit"
RELEASE = "release"
RELEASE_SCHEMA = "release-schema"


class TableRouteConflict(RuntimeError):
    """CDC:ErrTableRouteConflict — two live sources on one target."""

    def __init__(self, target: TableKey, existing: TableKey,
                 incoming: TableKey) -> None:
        super().__init__(
            f"table route conflict: target {target[0]}.{target[1]} is "
            f"owned by {existing[0]}.{existing[1]}, refused for "
            f"{incoming[0]}.{incoming[1]}")
        self.target, self.existing, self.incoming = target, existing, incoming


@dataclass(frozen=True)
class RouteBinding:
    source: TableKey
    target: TableKey


@dataclass(frozen=True)
class Admission:
    action: str           # ADMIT / RELEASE / RELEASE_SCHEMA
    source: TableKey
    binding: RouteBinding | None = None


class TargetTableRegistry:
    """Bidirectional source↔target ownership index with side-effect-free
    validation (`registry.go:26-118`)."""

    def __init__(self) -> None:
        self.source2target: dict[TableKey, TableKey] = {}
        self.target2source: dict[TableKey, TableKey] = {}

    def apply_transition(self, removes: list[TableKey],
                         adds: list[RouteBinding], mutate: bool) -> None:
        remove_set = set(removes)
        added_targets: dict[TableKey, TableKey] = {}
        for add in adds:
            existing = self.target2source.get(add.target)
            if existing is not None and existing != add.source \
                    and existing not in remove_set:
                raise TableRouteConflict(add.target, existing, add.source)
            prior_add = added_targets.get(add.target)
            if prior_add is not None and prior_add != add.source:
                raise TableRouteConflict(add.target, prior_add, add.source)
            added_targets[add.target] = add.source
        if not mutate:
            return
        for source in removes:
            target = self.source2target.pop(source, None)
            if target is not None:
                self.target2source.pop(target, None)
        for add in adds:
            self.target2source[add.target] = add.source
            self.source2target[add.source] = add.target


class RouteAdmin:
    """`Admin` twin; ``route_fn(schema, table) -> RouteBinding`` plays
    the Router (our rename rules live in `operators/routing.py`)."""

    def __init__(self, route_fn, tables: list[TableKey],
                 report_error=None) -> None:
        self.registry = TargetTableRegistry()
        self.active_routes: dict[TableKey, RouteBinding] = {}
        self.pending_queue: list[int] = []
        self.pending: dict[int, list[Admission]] = {}
        self.last_applied_commit_ts = 0
        self.report_error = report_error
        self.failed = False
        for schema, table in tables:
            binding = route_fn(schema, table)
            if binding.source in self.active_routes:
                continue
            self.registry.apply_transition([], [binding], True)
            self.active_routes[binding.source] = binding

    # -- the barrier protocol -------------------------------------------
    def precheck(self, commit_ts: int,
                 admissions: list[Admission]) -> bool:
        if not admissions:
            return True
        if commit_ts <= self.last_applied_commit_ts:
            return True  # resend of an applied barrier
        self._enqueue(commit_ts, admissions)
        if not self.pending_queue or self.pending_queue[0] != commit_ts:
            return False  # an earlier transition must apply first
        try:
            self._apply_transition(self.pending[commit_ts], mutate=False)
        except TableRouteConflict as e:
            self._fail(e)
            return False
        return True

    def apply(self, commit_ts: int,
              admissions: list[Admission]) -> bool:
        if commit_ts <= self.last_applied_commit_ts:
            return True
        if commit_ts not in self.pending:
            if not admissions:
                return True
            self._enqueue(commit_ts, admissions)
        if not self.pending_queue or self.pending_queue[0] != commit_ts:
            raise AssertionError(
                f"route pending queue head mismatch: expected {commit_ts},"
                f" queue {self.pending_queue}")
        try:
            self._apply_transition(self.pending[commit_ts], mutate=True)
        except TableRouteConflict as e:
            self._fail(e)
            return False
        self.pending_queue.pop(0)
        del self.pending[commit_ts]
        self.last_applied_commit_ts = commit_ts
        return True

    # -- internals ------------------------------------------------------
    def _enqueue(self, commit_ts: int,
                 admissions: list[Admission]) -> None:
        if commit_ts in self.pending:
            return
        self.pending[commit_ts] = list(admissions)
        self.pending_queue.append(commit_ts)
        self.pending_queue.sort()  # smallest unapplied ts at the head

    def _resolve(self, admissions: list[Admission]
                 ) -> tuple[list[TableKey], list[RouteBinding]]:
        releases: list[TableKey] = []
        admits: list[RouteBinding] = []
        for adm in admissions:
            if adm.action == ADMIT:
                admits.append(adm.binding)
            elif adm.action == RELEASE:
                releases.append(adm.source)
            elif adm.action == RELEASE_SCHEMA:
                releases.extend(
                    src for src in self.active_routes
                    if src[0] == adm.source[0])
        return releases, admits

    def _apply_transition(self, admissions: list[Admission],
                          mutate: bool) -> None:
        releases, admits = self._resolve(admissions)
        self.registry.apply_transition(releases, admits, mutate)
        if not mutate:
            return
        for source in releases:
            self.active_routes.pop(source, None)
        for admit in admits:
            self.active_routes[admit.source] = admit

    def _fail(self, err: Exception) -> None:
        if self.report_error is not None and not self.failed:
            self.failed = True
            self.report_error(err)
