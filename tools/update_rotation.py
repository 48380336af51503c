"""Regenerate the rotation log's code-change records.

Run at the START of each round, after updating ``_LAST_EXTERNAL`` from the
previous round's CORRECTNESS file:

    python tools/update_rotation.py            # rewrite _CHECKED_SRC in place
    python tools/update_rotation.py --check    # print drift, exit 1 if any

For every registered query this computes the hash of its implementing
module (plus the module's declared ROTATION_DEPS files) **as of the round
marker commit** (``round N: verdict/...``) of the query's last external
green, and writes the map into ``tomixpanel_spark/operators/__init__.py``
as ``_CHECKED_SRC``. ``ordered_names()`` then bumps any query whose
current code hash differs — code changed after its last hard driver check
outranks plain staleness in the external window (round-11 verdict #7).
"""

from __future__ import annotations

import hashlib
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def round_markers() -> dict[int, str]:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    markers: dict[int, str] = {}
    for line in out.splitlines():
        m = re.match(r"([0-9a-f]+) round (\d+): verdict", line)
        if m and int(m.group(2)) not in markers:  # newest first
            markers[int(m.group(2))] = m.group(1)
    return markers


_COMMIT_OK: set[str] = set()


def _require_commit(commit: str) -> None:
    """Raise on a bad/unreachable commit object BEFORE any per-path
    probe: git's path-level error message for a nonexistent SHA is the
    SAME "exists on disk, but not in '<sha>'" it emits for a genuinely
    absent path (verified against this repo's git), so commit validity
    must be established separately or a corrupt/shallow repo silently
    under-hashes every file as 'absent' (round-12 advice)."""
    if commit in _COMMIT_OK:
        return
    p = subprocess.run(
        ["git", "cat-file", "-e", f"{commit}^{{commit}}"],
        cwd=REPO,
        capture_output=True,
    )
    if p.returncode != 0:
        raise RuntimeError(
            f"bad or unreachable commit {commit}: "
            f"{p.stderr.decode(errors='replace').strip()}"
        )
    _COMMIT_OK.add(commit)


def historical_hash(
    commit: str, relpaths: list[str], allow_missing: bool = False
) -> str:
    """md5 of the declared files AS OF ``commit``. The commit object is
    validated first (bad object / shallow clone raises). A path absent
    at that VALID commit is a HARD ERROR by default: a renamed rotation
    dependency would otherwise produce a stable-but-wrong hash over the
    remaining files and silently pin changed_since_green semantics (the
    round-12/13 advice case). Pass ``allow_missing=True`` (CLI
    ``--allow-missing``) only when the absence is expected — e.g. a dep
    file genuinely introduced after that round's marker commit."""
    _require_commit(commit)
    md5 = hashlib.md5()
    for rel in relpaths:
        probe = subprocess.run(
            ["git", "cat-file", "-e", f"{commit}:{rel}"],
            cwd=REPO,
            capture_output=True,
        )
        if probe.returncode != 0:
            # commit already validated -> this is a path-level absence
            if not allow_missing:
                raise RuntimeError(
                    f"{rel} not present at {commit[:12]} — a renamed "
                    "rotation dependency would silently under-hash; "
                    "re-run with --allow-missing only if the absence "
                    "is expected (file introduced after that round)"
                )
            print(
                f"WARN: {rel} not present at {commit[:12]} — skipped "
                "from the recorded hash (--allow-missing)",
                file=sys.stderr,
            )
            continue
        p = subprocess.run(
            ["git", "show", f"{commit}:{rel}"],
            cwd=REPO,
            capture_output=True,
        )
        if p.returncode != 0:
            raise RuntimeError(
                f"git show failed for {commit}:{rel}: "
                f"{p.stderr.decode(errors='replace').strip()}"
            )
        # comment-insensitive, matching code_hash: both sides of the
        # changed-since-green comparison must normalize identically
        from tomixpanel_spark.operators import normalized_source

        md5.update(normalized_source(p.stdout))
    return md5.hexdigest()[:12]


def main() -> int:
    from tomixpanel_spark import operators as ops

    reg = ops._collect()
    markers = round_markers()
    checked: dict[str, str] = {}
    for q, rnd in sorted(ops._LAST_EXTERNAL.items()):
        if rnd == 0:
            continue
        if rnd not in markers:
            print(f"WARN: no marker commit for round {rnd} ({q})")
            continue
        rels = ops.module_relpaths(reg[q].fn.__module__)
        checked[q] = historical_hash(
            markers[rnd], rels, allow_missing="--allow-missing" in sys.argv
        )

    if "--check" in sys.argv:
        drift = {
            q: (checked.get(q), ops._CHECKED_SRC.get(q))
            for q in set(checked) | set(ops._CHECKED_SRC)
            if checked.get(q) != ops._CHECKED_SRC.get(q)
        }
        for q, (want, got) in sorted(drift.items()):
            print(f"drift {q}: recorded={got} regenerated={want}")
        return 1 if drift else 0

    path = os.path.join(REPO, "tomixpanel_spark", "operators", "__init__.py")
    src = open(path).read()
    body = "\n".join(f'    "{q}": "{h}",' for q, h in sorted(checked.items()))
    new = f"_CHECKED_SRC: dict[str, str] = {{\n{body}\n}}"
    src, n = re.subn(
        r"_CHECKED_SRC: dict\[str, str\] = \{[^}]*\}", new, src, count=1
    )
    assert n == 1, "could not find _CHECKED_SRC block"
    open(path, "w").write(src)
    print(f"wrote {len(checked)} recorded hashes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
