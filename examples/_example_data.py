"""Deterministic synthetic address tables for the runnable examples.

The reference's examples ship sample FHRS / Companies House parquet files
(examples/example_data/); this sandbox has no external data, so the same
SHAPE — a canonical address table and a messier second table that mostly
overlaps it — is synthesised from a seeded RNG.  Columns match the
reference's documented input contract (examples/example_matching.py:31-44):
(unique_id, source_dataset, address_concat, postcode).
"""

from __future__ import annotations

import random

import pyarrow as pa

_STREETS = [
    "HIGH STREET", "STATION ROAD", "CHURCH LANE", "VICTORIA ROAD",
    "GREEN LANE", "MANOR ROAD", "KINGS ROAD", "QUEENSWAY", "PARK AVENUE",
    "MILL LANE", "THE CRESCENT", "ALBERT ROAD", "YORK WAY", "BRIDGE STREET",
]
_TOWNS = [
    ("LONDON", "SW1A"), ("LEEDS", "LS1"), ("YORK", "YO1"), ("BATH", "BA1"),
    ("HULL", "HU1"), ("DERBY", "DE1"), ("OXFORD", "OX1"), ("LUTON", "LU1"),
]
_ABBREV = {
    "STREET": "ST", "ROAD": "RD", "LANE": "LN", "AVENUE": "AVE",
    "CRESCENT": "CRES",
}


def make_canonical(n: int = 300, seed: int = 7) -> pa.Table:
    rng = random.Random(seed)
    uids, addrs, pcs = [], [], []
    for i in range(n):
        street = _STREETS[rng.randrange(len(_STREETS))]
        town, outw = _TOWNS[rng.randrange(len(_TOWNS))]
        num = rng.randrange(1, 180)
        flat = f"FLAT {rng.randrange(1, 9)} " if rng.random() < 0.25 else ""
        addrs.append(f"{flat}{num} {street} {town}")
        pcs.append(f"{outw} {rng.randrange(1, 9)}{chr(65 + rng.randrange(26))}"
                   f"{chr(65 + rng.randrange(26))}")
        uids.append(f"c{i}")
    return pa.table(
        {
            "unique_id": pa.array(uids, pa.string()),
            "source_dataset": pa.array(["canonical"] * n, pa.string()),
            "address_concat": pa.array(addrs, pa.string()),
            "postcode": pa.array(pcs, pa.string()),
        }
    )


def make_messy(canonical: pa.Table, n: int = 120, seed: int = 11) -> pa.Table:
    """Messy variants of a sample of canonical rows: abbreviations, dropped
    flat prefixes, commas, occasional postcode typo in the LAST character
    (the trie stage's bread and butter)."""
    rng = random.Random(seed)
    c_addr = canonical["address_concat"].to_pylist()
    c_pc = canonical["postcode"].to_pylist()
    uids, addrs, pcs, truth = [], [], [], []
    for i in range(n):
        j = rng.randrange(len(c_addr))
        addr, pc = c_addr[j], c_pc[j]
        toks = addr.split(" ")
        toks = [_ABBREV.get(t, t) if rng.random() < 0.5 else t for t in toks]
        if toks[0] == "FLAT" and rng.random() < 0.3:
            toks = toks[2:]  # drop the flat prefix entirely
        addr = " ".join(toks)
        if rng.random() < 0.3:
            addr = addr.replace(" ", ", ", 1)
        if rng.random() < 0.2:
            pc = pc[:-1] + chr(65 + rng.randrange(26))  # last-char typo
        uids.append(f"m{i}")
        addrs.append(addr)
        pcs.append(pc)
        truth.append(f"c{j}")
    return pa.table(
        {
            "unique_id": pa.array(uids, pa.string()),
            "source_dataset": pa.array(["messy"] * n, pa.string()),
            "address_concat": pa.array(addrs, pa.string()),
            "postcode": pa.array(pcs, pa.string()),
            "true_canonical_id": pa.array(truth, pa.string()),
        }
    )
