"""Reference-shaped planted-violation fixtures (FIXTURES.md §B).

Three tiny CSV tables mirroring the reference's schema
(``pre_analysis.py:114,118,122``), with one planted violation per
cleaning rule R1–R7 plus dedup/impute/multiline-CSV cases. The
expected outcome of every plant is encoded in EXPECTED_* below so the
golden tests are table-driven.
"""

from __future__ import annotations

import os

HEADER_ONB = (
    "_c0,Unnamed: 0,first_login_dt,week_year,user_id,habito,habito_dt,"
    "activacion,activacion_dt,setup,setup_dt,return,return_dt"
)

# user → row(s). Dates ISO. Flags as 0/1 strings (stringly ingest).
ONBOARDING_ROWS = [
    # u1: fully clean active user (3 transactions)
    "1,1,2024-01-01,1,MLB1,1,2024-02-01,1,2024-01-20,1,2024-01-10,1,2024-03-01",
    # u2: duplicated key — dedup keeps serial 2 (deterministic keep-first)
    "2,2,2024-01-02,1,MLB2,0,,0,,0,,0,",
    "3,3,2024-01-03,1,MLB2,0,,0,,0,,0,",
    # u3: NULL habito → imputed to 0
    "4,4,2024-01-04,1,MLB3,,,0,,0,,0,",
    # u4: R1 violation — habito=0 but habito_dt present → deleted
    "5,5,2024-01-05,1,MLB4,0,2024-02-05,0,,0,,0,",
    # u5: R2 violation — NULL first_login_dt → deleted
    "6,6,,1,MLB5,0,,0,,0,,0,",
    # u6: R3 violation — habito=1 ∧ activacion=0 → deleted
    "7,7,2024-01-07,1,MLB6,1,2024-02-07,0,,0,,0,",
    # u7: R4 violation — activacion_dt < setup_dt → deleted
    "8,8,2024-01-08,1,MLB7,0,,1,2024-01-15,1,2024-01-25,0,",
    # u8: R5 violation — activacion=1 ∧ setup=0 → deleted
    "9,9,2024-01-09,1,MLB8,0,,1,2024-01-16,0,,0,",
    # u9: R6 violation — return_dt < first_login_dt → deleted
    "10,10,2024-01-10,1,MLB9,0,,0,,0,,1,2024-01-05",
    # u10: R7 repair — activacion=1 (valid dates) but ZERO transactions
    "11,11,2024-01-11,1,MLB10,0,,1,2024-01-22,1,2024-01-12,0,",
    # u11: clean inactive user
    "12,12,2024-01-12,2,MLB11,0,,0,,0,,0,",
]

# survivors after R1–R6 (before R7 repair)
EXPECTED_SURVIVORS = {"MLB1", "MLB2", "MLB3", "MLB10", "MLB11"}
EXPECTED_DEDUP_SERIAL = {"MLB2": 2}
EXPECTED_R7_REPAIRED = {"MLB10"}

HEADER_TXN = "_c0,user_id,transaction_dt,type,segment"
TRANSACTION_ROWS = [
    "0,MLB1,2024-01-21 10:00:00,1,1",
    "1,MLB1,2024-01-22 11:00:00,2,1",
    "2,MLB1,2024-01-23 12:00:00,3,2",
    "3,MLB2,2024-01-24 09:00:00,4,1",
    # planted integrity violations (type out of 1-9, bad date) — used by
    # profile tests, harmless to clean()
    "4,MLB3,2024-01-25 08:00:00,12,1",
    "5,MLB11,not-a-date,2,7",
]

HEADER_USERS = "_c0,user_id,name,email,address,birth_dt,phone,type,rubro"
USERS_ROWS = [
    '0,MLB1,Ana,a@x.com,"Main St 1",1990-05-01,111,1,3.0',
    # exact duplicate full row → full-row dedup keeps one
    '1,MLB2,Bob,b@x.com,"Side St 2",1980-06-02,222,1,0',
    '1,MLB2,Bob,b@x.com,"Side St 2",1980-06-02,222,1,0',
    # embedded quoted newline (multiLine/escape CSV path, S2)
    '2,MLB3,Cy,c@x.com,"Apt 5\nFloor 2",2001-07-03,333,2,1.5',
    # non-numeric rubro → NULL after normalize (NULL-on-malformed)
    '3,MLB10,Dee,d@x.com,"Any 4",1965-08-04,444,1,not-a-number',
    "4,MLB11,Eli,e@x.com,Plain 5,1940-09-05,555,2,2.0",
]


def write_fixtures(dirpath: str) -> dict[str, str]:
    paths = {}
    for name, header, rows in [
        ("lk_onboarding", HEADER_ONB, ONBOARDING_ROWS),
        ("bt_users_transactions", HEADER_TXN, TRANSACTION_ROWS),
        ("lk_users", HEADER_USERS, USERS_ROWS),
    ]:
        p = os.path.join(dirpath, f"{name}.csv")
        with open(p, "w") as f:
            f.write(header + "\n" + "\n".join(rows) + "\n")
        paths[name] = p
    return paths
