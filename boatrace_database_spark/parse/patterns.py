"""Record grammar of the official daily TXT files (CP932 fixed layout).

These regexes are the *file-format specification*: they must accept and
capture exactly the byte shapes the reference parser accepts, or the
silver tables diverge from the committed goldens. Shapes derived from
reference patterns.py:23-41 and observed raw files under
/root/reference/txt/ (see SURVEY §2.4 for the edge-case fine print:
特払い, レース不成立, missing 複勝2, unlabeled 拡連複13/23 rows,
full-width vs half-width distance markers).

Kept intentionally semantically identical to the reference grammar —
including its quirks (e.g. RESULT only matches ranks written ``0d``, so
disqualification codes F/L0/S0-S2/K0 are dropped; the generic ``\\d-\\d``
shape for the unlabeled 拡連複 rows can misalign when a stanza line is
missing). Those quirks are the spec (SURVEY §2.4); do not "fix" them.
"""

from __future__ import annotations

import re

# Venue section header: 28 leading spaces then the full-width banner.
# K files carry 競走成績 (results), B files 番組表 (program).
# (reference patterns.py:23)
SECTION_HEADER = re.compile(r"^\s{28}＊＊＊　競走成績　＊＊＊|^\s{28}＊＊＊　番組表　＊＊＊")

# 2 lines below the banner: the race/event name, indented exactly 10 spaces.
# (reference patterns.py:24)
RACE_NAME = re.compile(r"\s{10,10}([^\s]+)")

# 2 further lines below: `ボートレース<venue>` — venue may embed full-width
# padding spaces (e.g. 大　村) which byte-parity requires keeping.
# (reference patterns.py:25)
RACE_PLACE = re.compile(r"ボートレース(\D+)\s")

# Race header line doubles as the per-race environment record:
# `1R 一　般 H1800m 晴　 風 西　　 2m 波 1cm`  → captures
# (weather, wind_dir, wind_speed, wave). Anchored after the distance `m`.
# (reference patterns.py:26)
ENV = re.compile(r"m\s+([^　]+)\s+風\s+([^　]+)\s+(\d+)m\s+波\s+(\d+)cm")

# Program (B-file) per-lane line: lane, player-reg-no, name, age, branch,
# weight, class, then 6 rate columns; motor/boat *numbers* are skipped by
# non-capturing `\d+\s+` — only their 2率 values are captured.
# (reference patterns.py:27)
SCHEDULE = re.compile(
    r"^([1-6])\s(\d{4})(\D+)(\d{2})(\D+)(\d{2})([AB][12])"
    r"\s+(\d+.\d{2})\s+(\d+.\d{2})\s+(\d+.\d{2})\s+(\d+.\d{2})"
    r"\s+\d+\s+(\d+.\d{2})\s+\d+\s+(\d+.\d{2})"
)

# Result (K-file) per-boat line: rank written `0d` (01-06, rare 00), lane,
# player-reg-no, name, motor no, boat no, exhibition time. Non-`0d` rank
# codes (F/L0/S0/S1/S2/K0) deliberately do NOT match.
# (reference patterns.py:28)
RESULT = re.compile(r"\s+0(\d)\s+\d\s+(\d{4})\s+\D+\s\d+\s+\d+\s+(\d+.\d{2})")

# Odds stanza anchor: the 単勝 line, or the cancelled-race marker.
# (reference patterns.py:29)
ODDS_ANCHOR = re.compile(r"\s+単勝|\s+レース不成立")

# The 10 positional payout shapes, one per stanza line except 複勝1/複勝2
# which share a line (hence the cursor does not advance after 複勝1).
# Lines 7-8 (拡連複 1-3 / 2-3) carry no label. (reference patterns.py:30-41)
ODDS_STANZA = (
    re.compile(r"\s+単勝\s+\d\s+(\d+)"),
    re.compile(r"\s+複勝\s+\d\s+(\d+)"),
    re.compile(r"\s+複勝\s+\d\s+\d+\s+\d\s+(\d+)"),
    re.compile(r"\s+２連単\s+\d-\d\s+(\d+)"),
    re.compile(r"\s+２連複\s+\d-\d\s+(\d+)"),
    re.compile(r"\s+拡連複\s+\d-\d\s+(\d+)"),
    re.compile(r"\s+\d-\d\s+(\d+)"),
    re.compile(r"\s+\d-\d\s+(\d+)"),
    re.compile(r"\s+３連単\s+\d-\d-\d\s+(\d+)"),
    re.compile(r"\s+３連複\s+\d-\d-\d\s+(\d+)\s+人気\s+\d+"),
)

# Race-number tick: the distance marker appears once per race header.
# K files use half-width `H1800m`, B files full-width `Ｈ１８００ｍ`.
# (reference main.py:158)
DISTANCE_MARKER = re.compile(r"H\d+m|Ｈ[^ｍ]+ｍ")

CANCELLED = "レース不成立"

# ---------------------------------------------------------------------------
# EXTENSION grammar (not in the reference parser — SURVEY §1.2 lists these
# as dropped fields; README.md:19 shows 平均スタートタイミング was a model
# feature, so the engine parses them). Matches every per-boat K-file line
# including the disqualification codes the parity RESULT regex drops.
RESULT_EXT_HEAD = re.compile(r"^  (0[0-6]|F |L[01]|S[012]|K[01])\s+([1-6]) (\d{4}) ")

# Fixed ASCII tail layout after the 8-char full-width name (byte-validated
# over the full Aug-2020 corpus: 28,860/28,860 lines slice cleanly):
#   [0:4) motor_no  [4:9) boat_no  [9:15) exhibition  [15:19) entry course
#   [19:28) start timing (0.15 / F0.01 / K . / L .)  [28:40) race time
RESULT_EXT_TAIL_START = 21

# Per-race column-header line carrying the winning technique (決まり手)
# after the ﾚｰｽﾀｲﾑ column label.
RACE_META_LINE = re.compile(r"^  着 艇 登番")
KIMARITE_ANCHOR = "ﾚｰｽﾀｲﾑ"
