"""Property fuzz of the sessionize state-machine core
(`streaming.stateful.sessionize_advance`) — pure driver-side, no Spark.

P1 (the operator's documented contract — batches in order ACROSS
batches, i.e. each batch's min >= the previous batch's max, as both the
catalog replay and any range-partitioned log replay guarantee): feeding
the events through ANY such batch split must emit exactly the non-final
islands of the classic gaps-and-islands decomposition of the full
sorted sequence, with the final island left open in state — batch
boundaries must be semantically invisible.

P2 (arbitrary, even out-of-order, batch splits): structural invariants
hold regardless — every closed session and the open state satisfy
start <= last and n >= 1, and event counts are conserved.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from simplemapreduce_spark.streaming.stateful import sessionize_advance

GAP = 1_000  # small gap so random fixtures genuinely split


def islands(sorted_ts: list[int], gap: int) -> list[tuple[int, int, int]]:
    """Reference gaps-and-islands over one fully-sorted sequence."""
    out = []
    cur = None
    for t in sorted_ts:
        if cur is None or t - cur[1] > gap:
            if cur is not None:
                out.append(tuple(cur))
            cur = [t, t, 0]
        cur[1] = t
        cur[2] += 1
    if cur is not None:
        out.append(tuple(cur))
    return out


def run_batches(batches: list[list[int]]):
    state = None
    closed = []
    for b in batches:
        got, state = sessionize_advance(state, sorted(b), GAP)
        closed.extend(got)
    return closed, state


@st.composite
def ordered_batches(draw):
    ts = sorted(draw(st.lists(st.integers(0, 50_000), min_size=1, max_size=60)))
    cuts = sorted(draw(st.lists(st.integers(0, len(ts)), max_size=6)))
    bounds = [0, *cuts, len(ts)]
    return [ts[a:b] for a, b in zip(bounds, bounds[1:]) if b > a]


@given(ordered_batches())
@settings(max_examples=200, deadline=None)
def test_in_order_batch_splits_are_invisible(batches):
    all_ts = sorted(t for b in batches for t in b)
    ref = islands(all_ts, GAP)
    closed, state = run_batches(batches)
    assert closed == ref[:-1]
    assert tuple(state) == ref[-1]


@given(
    st.lists(
        st.lists(st.integers(0, 50_000), min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_arbitrary_batches_keep_structural_invariants(batches):
    batches = [b for b in batches if b]
    if not batches:
        return
    closed, state = run_batches(batches)
    n_total = sum(len(b) for b in batches)
    for s, l, n in closed:
        assert s <= l and n >= 1
    assert state[0] <= state[1] and state[2] >= 1
    assert sum(n for _, _, n in closed) + state[2] == n_total


# --- round-8 late-island semantics (ADVICE r7 #1) ---------------------


def test_super_gap_late_event_is_its_own_island_not_absorbed():
    """The exact ADVICE reproduction: state [1000, 1100], gap 100, late
    event 500 — pre-fix the envelope silently widened to [500, 1100];
    now the late event closes as its own singleton and the open session
    is untouched."""
    closed, state = sessionize_advance([1000, 1100, 2], [500], 100)
    assert closed == [(500, 500, 1)]
    assert state == [1000, 1100, 2]


def test_adjacent_late_events_merge_into_one_island():
    closed, state = sessionize_advance([1000, 1100, 2], [100, 150, 500], 100)
    assert closed == [(100, 150, 2), (500, 500, 1)]
    assert state == [1000, 1100, 2]


def test_late_island_abutting_open_session_merges_envelopes():
    """850 is super-gap-late vs start 1000, but 901 (within gap of 1000)
    pulls the open start down to 901, putting the island within the gap
    of the session — one session by the gap rule, envelopes merge."""
    closed, state = sessionize_advance([1000, 1100, 2], [850, 901], 100)
    assert closed == []
    assert state == [850, 1100, 4]


def test_within_gap_late_event_still_absorbed_into_envelope():
    closed, state = sessionize_advance([1000, 1100, 2], [950], 100)
    assert closed == []
    assert state == [950, 1100, 3]


def test_empty_batch_returns_state_unchanged_and_none_passthrough():
    assert sessionize_advance([1000, 1100, 2], [], 100) == ([], [1000, 1100, 2])
    assert sessionize_advance(None, [], 100) == ([], None)


@given(
    st.lists(
        st.lists(st.integers(0, 50_000), min_size=0, max_size=30),
        min_size=1,
        max_size=6,
    )
)
@settings(max_examples=200, deadline=None)
def test_arbitrary_batches_no_closed_session_spans_a_super_gap_hole(batches):
    """P3: with the late-island fix, no emitted session's span can
    exceed (n - 1) * gap — the tightest width bound a gap rule allows —
    so a session can never bridge a hole wider than the gap per event."""
    batches = [b for b in batches if b]
    if not batches:
        return
    closed, state = run_batches(batches)
    for s, l, n in closed:
        assert l - s <= (n - 1) * GAP
    if state is not None:
        s, l, n = state
        assert l - s <= (n - 1) * GAP


def test_late_island_merges_even_when_open_session_gap_closes_mid_batch():
    """Round-8 review regression: state [1000,1100], gap 100, batch
    [850, 901, 1300]. 850 opens a late island; 901 shrinks the open
    start to 901 (island now abuts); 1300 gap-closes the session. The
    island must be merged into the closing envelope BEFORE the close —
    the pre-fix code compared it against the NEW session and split
    within-gap events 850/901 into two sessions."""
    closed, state = sessionize_advance([1000, 1100, 2], [850, 901, 1300], 100)
    assert closed == [(850, 1100, 4)]
    assert state == [1300, 1300, 1]


@given(
    st.lists(st.integers(0, 50_000), min_size=1, max_size=60),
    st.lists(st.integers(0, 50_000), min_size=0, max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_single_batch_with_prior_state_never_splits_within_gap_events(
    first, second
):
    """P4: after any in-order first batch, feeding ANY second batch in
    one call must never emit two sessions (closed or open) whose spans
    are within the gap of each other AND whose union would be a valid
    single island — i.e. within one advance call the gap rule is
    honored exactly. Checked pairwise on the emitted set plus state."""
    _, state = sessionize_advance(None, sorted(first), GAP)
    closed, state2 = sessionize_advance(list(state), sorted(second), GAP)
    spans = list(closed) + ([tuple(state2)] if state2 else [])
    spans.sort()
    for (s1, l1, _), (s2, l2, _) in zip(spans, spans[1:]):
        # ADVICE r8: the old `or (s2 <= l1)` escape clause would have
        # accepted nested/overlapping emitted sessions. Overlap is
        # unreachable in the current machine (late islands always end
        # strictly more than gap below cur's start when closed
        # separately), so assert the strict gap rule alone.
        # ADVICE r9 #4: distinguish the two failure modes — an
        # overlap/nesting (s2 <= l1) violating the unreachable-overlap
        # claim above vs. plain within-gap adjacency — so a future
        # failure isn't misdiagnosed.
        kind = (
            "overlapping/nested emitted sessions (unreachable-overlap "
            "claim violated)"
            if s2 <= l1
            else "adjacent emitted sessions within gap"
        )
        assert s2 - l1 > GAP, f"{kind}: ({s1},{l1}) ({s2},{l2})"
