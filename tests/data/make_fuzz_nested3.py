"""Generate tests/data/fuzz_nested3.parquet (fuzz v6, r11).

One nesting level past fuzz_nested2: map-of-STRUCT-OF-MAP,
list-of-MAP-OF-LIST, struct-of-LIST-OF-LIST — with NULL / empty /
NULL-element variants at EVERY level and unicode carriers in keys and
strings.  12 rows, k = 1..12.  Deterministic: re-running reproduces the
committed file byte-for-byte (fixed values, no RNG).

Run from the repo root:  python tests/data/make_fuzz_nested3.py
"""

import pyarrow as pa
import pyarrow.parquet as pq

MM = pa.map_(pa.string(), pa.int64())
STRUCT_PMM = pa.struct([("p", pa.int64()), ("mm", MM)])
MSM = pa.map_(pa.string(), STRUCT_PMM)
LML = pa.list_(pa.map_(pa.string(), pa.list_(pa.int64())))
SLL = pa.struct([("a", pa.list_(pa.list_(pa.int64()))), ("t", pa.string())])

SCHEMA = pa.schema(
    [
        ("k", pa.int64()),
        ("msm", MSM),
        ("lml", LML),
        ("sll", SLL),
        ("ut", pa.string()),
    ]
)


def st(p, mm):
    return {"p": p, "mm": mm}


ROWS = [
    # 1: fully populated, ascii keys
    (1,
     [("a", st(10, [("x", 1), ("y", 2)])), ("b", st(20, [("x", 3)]))],
     [[("u", [1, 2, 3]), ("v", [4])], [("u", [5])]],
     {"a": [[1, 2], [3]], "t": "alpha"},
     "plain ascii"),
    # 2: msm NULL; lml single map; sll.a with empty inner list
    (2, None,
     [[("u", [7, 8])]],
     {"a": [[], [9]], "t": "beta"},
     "café résumé"),
    # 3: msm empty map; lml NULL; sll NULL
    (3, [], None, None, "ß İ casing"),
    # 4: msm value struct NULL; lml empty list
    (4, [("a", None)], [],
     {"a": [[10]], "t": None},
     "emoji 🎉🚀"),
    # 5: struct p NULL, mm populated; lml NULL element
    (5, [("a", st(None, [("x", 11)]))],
     [None],
     {"a": None, "t": "gamma"},
     "中文漢字"),
    # 6: mm NULL inside struct; lml element = empty map
    (6, [("a", st(60, None))],
     [[]],
     {"a": [[12, 13], None], "t": "delta"},
     "עברית rtl"),
    # 7: mm empty; lml map with empty list value
    (7, [("a", st(70, []))],
     [[("u", [])]],
     {"a": [[14]], "t": "epsilon"},
     "tab\there"),
    # 8: mm with NULL value; lml map with NULL list value
    (8, [("a", st(80, [("x", None), ("y", 81)]))],
     [[("u", None), ("w", [15])]],
     {"a": [[16, None]], "t": "zeta"},
     "line\nbreak"),
    # 9: unicode map keys at both depths
    (9, [("clé", st(90, [("键", 91)]))],
     [[("ключ", [17, 18])]],
     {"a": [[19], [20, 21]], "t": "ünïcødé"},
     "á combining"),
    # 10: two msm entries sharing mm keys; nested list with NULL element
    (10,
     [("a", st(100, [("x", 1)])), ("c", st(101, [("x", 2), ("z", 3)]))],
     [[("u", [22]), ("v", [23, 24])], [("v", [25])]],
     {"a": [None, [26]], "t": "eta"},
     "MIXED Case"),
    # 11: everything minimal-but-present
    (11, [("b", st(110, [("x", 111)]))],
     [[("u", [27])]],
     {"a": [[28]], "t": "theta"},
     ""),
    # 12: NULL ut; deep empties
    (12, [("a", st(120, []))],
     [[], [("u", [29, 30])]],
     {"a": [[], []], "t": "iota"},
     None),
]


def main() -> None:
    cols = list(zip(*ROWS))
    table = pa.Table.from_arrays(
        [
            pa.array(cols[0], type=pa.int64()),
            pa.array(cols[1], type=MSM),
            pa.array(cols[2], type=LML),
            pa.array(cols[3], type=SLL),
            pa.array(cols[4], type=pa.string()),
        ],
        schema=SCHEMA,
    )
    pq.write_table(table, "tests/data/fuzz_nested3.parquet", version="2.6")
    print(table.schema)
    print("rows:", table.num_rows)


if __name__ == "__main__":
    main()
