"""Seeded synthetic pin/geo/user generator — the emulation stand-in.

Reproduces the record shape and dirty-value distribution of the reference's
emulation producers (user_posting_emulation*.py: seeded RNG, three
correlated tables keyed 1:1 on ind/index, record-at-a-time JSON) and the
garbage values its cleaning pipeline was built to handle (FIXTURES.md §1):
k/M suffix variants, "User Info Error", "No Title Data Available",
"Local save in /…" prefixes, the comma-exploded tag sentinel, empty-string
categories, and the Kinesis cross-stream pollution rows (all-null except
key). Deterministic: same seed → same records.

Edge rows guaranteed (FIXTURES.md): an all-sentinel row, all-null pollution
rows in pin and geo, and a country where two top users tie on
follower_count (the RANK multi-row case, BatchProcessingFinal.ipynb:5687).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import random
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from ..schemas import GEO_RAW, PIN_RAW, USER_RAW

DEFAULT_SEED = 100  # the reference's random.seed(100), user_posting_emulation.py:11

CATEGORIES = [
    "mens-fashion", "beauty", "travel", "art", "quotes", "diy-and-crafts",
    "tattoos", "finance", "education", "vehicles", "christmas", "home-decor",
]
COUNTRIES = [
    "United States", "India", "Brazil", "United Kingdom", "Germany", "France",
    "Canada", "Australia", "Japan", "Mexico", "Italy", "Spain", "Poland",
    "Netherlands", "Turkey", "Sweden", "Norway", "Ireland", "Portugal",
    "Austria", "Greece", "Finland", "Denmark", "Belgium", "Switzerland",
    "Chile", "Peru", "Colombia", "Argentina", "Egypt",
]
FIRST_NAMES = ["Alice", "Bob", "Carol", "David", "Emma", "Frank", "Grace", "Henry",
               "Iris", "Jack", "Karen", "Liam", "Mona", "Ned", "Olga", "Paul"]
LAST_NAMES = ["Smith", "Jones", "Brown", "Taylor", "Wilson", "Davis", "Clark",
              "Hall", "Young", "King", "Wright", "Lopez", "Hill", "Green"]
WORDS = ["style", "vintage", "modern", "cozy", "bright", "minimal", "bold",
         "classic", "rustic", "elegant", "urban", "natural", "fresh", "warm"]

TAG_SENTINEL = "N,o, ,T,a,g,s, ,A,v,a,i,l,a,b,l,e"
TITLE_SENTINEL = "No Title Data Available"
DESC_SENTINEL = "No description available Story format"
USER_SENTINEL = "User Info Error"
IMG_SENTINEL = "Image src error."


def _ts(rng: random.Random, start_year: int, end_year: int) -> str:
    base = dt.datetime(start_year, 1, 1)
    span = int((dt.datetime(end_year, 12, 31) - base).total_seconds())
    return (base + dt.timedelta(seconds=rng.randint(0, span))).strftime("%Y-%m-%d %H:%M:%S")


def _follower_count(rng: random.Random) -> str:
    roll = rng.random()
    if roll < 0.08:
        return USER_SENTINEL
    n = rng.randint(1, 999)
    style = rng.random()
    if style < 0.35:
        return f"{n}{rng.choice('kK')}"
    if style < 0.45:
        return f"{rng.randint(1, 9)}{rng.choice('mM')}"
    if style < 0.50:
        return f"{rng.randint(1, 9)}.{rng.randint(1, 9)}k"  # decimal-suffix edge
    return str(rng.randint(0, 100_000))


def generate_records(
    n: int = 500, seed: int = DEFAULT_SEED
) -> tuple[list[dict[str, Any]], list[dict[str, Any]], list[dict[str, Any]]]:
    """Three correlated record lists (pin, geo, user), 1:1 on ind/index,
    plus the edge rows. Lengths may exceed n by the injected edge rows."""
    if n <= 0:
        return [], [], []
    rng = random.Random(seed)
    pins: list[dict[str, Any]] = []
    geos: list[dict[str, Any]] = []
    users: list[dict[str, Any]] = []
    for i in range(n):
        category = rng.choice(CATEGORIES) if rng.random() > 0.03 else ""
        title = (
            TITLE_SENTINEL
            if rng.random() < 0.06
            else " ".join(rng.choice(WORDS) for _ in range(3)).title()
        )
        desc = (
            DESC_SENTINEL
            if rng.random() < 0.06
            else " ".join(rng.choice(WORDS) for _ in range(8))
        )
        poster = rng.choice(FIRST_NAMES) if rng.random() > 0.05 else USER_SENTINEL
        tag_list = (
            TAG_SENTINEL
            if rng.random() < 0.07
            else ",".join(rng.choice(WORDS) for _ in range(rng.randint(1, 5)))
        )
        img = IMG_SENTINEL if rng.random() < 0.05 else f"https://i.pinimg.com/{i}.jpg"
        pins.append(
            {
                "index": i,
                "unique_id": f"{rng.getrandbits(32):08x}-0000-4000-8000-{rng.getrandbits(48):012x}",
                "title": title,
                "description": desc,
                "poster_name": poster,
                "follower_count": _follower_count(rng),
                "tag_list": tag_list,
                "is_image_or_video": rng.choice(
                    ["image", "video", "multi-video(story page format)"]
                ),
                "image_src": img,
                "downloaded": rng.randint(0, 1),
                "save_location": f"Local save in /data/{category or 'misc'}",
                "category": category,
            }
        )
        geos.append(
            {
                "ind": i,
                "timestamp": _ts(rng, 2015, 2022),
                "latitude": round(rng.uniform(-90, 90), 4),
                "longitude": round(rng.uniform(-180, 180), 4),
                "country": rng.choice(COUNTRIES[: 8 + (i % 22)]),
            }
        )
        users.append(
            {
                "ind": i,
                "first_name": rng.choice(FIRST_NAMES),
                "last_name": rng.choice(LAST_NAMES),
                "age": str(rng.randint(16, 70)),
                "date_joined": _ts(rng, 2015, 2021),
            }
        )

    # Edge rows (FIXTURES.md): all-sentinel pin; pollution rows; rank tie.
    i = n
    pins.append(
        {
            "index": i, "unique_id": "0" * 8 + "-0000-4000-8000-" + "0" * 12,
            "title": TITLE_SENTINEL, "description": DESC_SENTINEL,
            "poster_name": USER_SENTINEL, "follower_count": USER_SENTINEL,
            "tag_list": TAG_SENTINEL, "is_image_or_video": "image",
            "image_src": IMG_SENTINEL, "downloaded": 0,
            "save_location": "Local save in /data/misc", "category": "",
        }
    )
    geos.append({"ind": i, "timestamp": _ts(rng, 2018, 2020), "latitude": 1.0,
                 "longitude": 1.0, "country": COUNTRIES[0]})
    users.append({"ind": i, "first_name": "Edge", "last_name": "Case",
                  "age": "17", "date_joined": _ts(rng, 2016, 2016)})
    # Kinesis pollution: all-null except key.
    i += 1
    pins.append({k: None for k in pins[0]} | {"index": i})
    geos.append({k: None for k in geos[0]} | {"ind": i})
    users.append({"ind": i, "first_name": "Null", "last_name": "Geo",
                  "age": "30", "date_joined": _ts(rng, 2017, 2017)})
    # Follower-count tie within one country (RANK returns both).
    for j, fc in ((i + 1, "500k"), (i + 2, "500k")):
        pins.append(
            {
                "index": j, "unique_id": f"{j:08d}-0000-4000-8000-" + "1" * 12,
                "title": "Tie Row", "description": "tie", "poster_name": f"Tier{j}",
                "follower_count": fc, "tag_list": "tie", "is_image_or_video": "image",
                "image_src": f"https://i.pinimg.com/{j}.jpg", "downloaded": 1,
                "save_location": "Local save in /data/art", "category": "art",
            }
        )
        geos.append({"ind": j, "timestamp": _ts(rng, 2019, 2019), "latitude": 2.0,
                     "longitude": 2.0, "country": "Liechtenstein"})
        users.append({"ind": j, "first_name": "Tie", "last_name": f"User{j}",
                      "age": "28", "date_joined": _ts(rng, 2018, 2018)})
    return pins, geos, users


def to_dataframes(
    spark: SparkSession, n: int = 500, seed: int = DEFAULT_SEED
) -> tuple[DataFrame, DataFrame, DataFrame]:
    pins, geos, users = generate_records(n, seed)
    return (
        spark.createDataFrame(pins, PIN_RAW),
        spark.createDataFrame(geos, GEO_RAW),
        spark.createDataFrame(users, USER_RAW),
    )


def write_blob_stream_files(
    out_dir: str, n: int = 500, seed: int = DEFAULT_SEED, files_per_table: int = 4
) -> dict[str, str]:
    """Write the records as the Kinesis blob contract (one JSON string per
    line in a `data` field — Kinesis_Processing.ipynb:712) split across
    several files, for the file-based streaming source stand-in."""
    tables = dict(zip(("pin", "geo", "user"), generate_records(n, seed)))
    paths = {}
    for name, records in tables.items():
        table_dir = os.path.join(out_dir, name)
        os.makedirs(table_dir, exist_ok=True)
        chunk = max(1, len(records) // files_per_table)
        for fi in range(0, len(records), chunk):
            with open(os.path.join(table_dir, f"part-{fi:05d}.json"), "w") as fh:
                for rec in records[fi : fi + chunk]:
                    fh.write(json.dumps({"data": json.dumps(rec)}) + "\n")
        paths[name] = table_dir
    return paths
