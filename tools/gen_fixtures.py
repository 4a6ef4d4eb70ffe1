#!/usr/bin/env python3
"""Deterministic fixture generator mirroring the reference pipeline's source
formats (see SURVEY.md §1): ground-truth CSV, per-scene station-list text
files, nested MTL metadata JSON, scene tensors as JSONL, a station catalog
CSV, and small binary blobs. Run once; output is committed under fixtures/.
"""
import json, os, random, struct

random.seed(42)
ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures")

L5 = "LT05_L1TP_174038_{d}_20200831_02_T1"
L8 = "LC08_L1TP_175037_{d}_20200911_02_T1"
L9 = "LC09_L1TP_174038_{d}_20230215_02_T1"
LO8 = "LO08_L1TP_175037_{d}_20200911_02_T1"  # 9 bands -> dropped by P4

dates = ["20060103", "20060715", "20061102", "20140628", "20140830",
         "20141017", "20230110", "20230420", "20060207", "20140215",
         "20060924", "20141229"]

scenes = []
for i, d in enumerate(dates):
    if i % 4 == 0:
        sid, nbands = L5.format(d=d), 7
    elif i % 4 in (1, 3):
        sid, nbands = L8.format(d=d), 11
    else:
        sid, nbands = L9.format(d=d), 11
    scenes.append((sid, nbands, d))
# one malformed-band-count scene (LO08, 9 bands)
scenes.append((LO8.format(d="20140501"), 9, "20140501"))

station_ids = [2, 6, 8, 10, 13, 16, 21, 23, 24, 28, 30, 33, 35, 36, 41,
               42, 44, 45, 54, 58]

os.makedirs(ROOT, exist_ok=True)
os.makedirs(f"{ROOT}/stations", exist_ok=True)
os.makedirs(f"{ROOT}/metadatas", exist_ok=True)
os.makedirs(f"{ROOT}/scenes", exist_ok=True)
os.makedirs(f"{ROOT}/binary", exist_ok=True)

# --- station catalog (like IMS_STATIONS, config.py:34-204) ---------------
with open(f"{ROOT}/stations_catalog.csv", "w") as f:
    f.write("id,name,longitude,latitude\n")
    for s in station_ids:
        lon = round(34.2 + (s * 7 % 23) * 0.05, 4)
        lat = round(29.5 + (s * 11 % 37) * 0.09, 4)
        f.write(f"{s},STATION_{s},{lon},{lat}\n")

# --- ground truths CSV (data_loader.py:77-91 schema) ---------------------
# includes: duplicates on (date, station) to exercise first-match (J1/A4),
# -9999.0 sentinel rows (P3), and gaps (left-join miss -> -9999 fill).
rows = []
for sid, nbands, d in scenes:
    date_iso = f"{d[:4]}-{d[4:6]}-{d[6:8]}"
    for s in station_ids:
        h = (s * 31 + int(d)) % 100
        if h < 15:
            continue  # gap -> join miss
        temp = -9999.0 if h < 25 else round(5.0 + (h % 40) * 0.85, 2)
        rows.append((date_iso, s, temp))
        if h % 10 == 7:  # duplicate with a different temp: first-match wins
            rows.append((date_iso, s, round(temp + 1.5, 2)))
# some rows on dates with no scene at all
for extra_d in ["2005-06-01", "2015-01-20"]:
    for s in station_ids[:5]:
        rows.append((extra_d, s, round(11.1 + s * 0.3, 2)))
with open(f"{ROOT}/ground_truths.csv", "w") as f:
    f.write("utc_date,station_id,air_temp\n")
    for d, s, t in rows:
        f.write(f"{d},{s},{t}\n")

# --- per-scene station list text files (data_loader.py:15-28 format) -----
for sid, nbands, d in scenes:
    k = 4 + (sum(ord(c) for c in sid) % 6)
    mine = [s for i, s in enumerate(station_ids) if (i + int(d)) % 3 != 0][:k]
    with open(f"{ROOT}/stations/{sid}_stations.txt", "w") as f:
        f.write("[" + ", ".join(str(s) for s in mine) + "]\n")

# --- MTL metadata JSON (nested, multiline; data_loader.py:31-42) ---------
# two scenes deliberately have NO metadata file -> S6 drop-on-missing.
missing_meta = {scenes[5][0], scenes[9][0]}
for sid, nbands, d in scenes:
    if sid in missing_meta:
        continue
    is_l5 = nbands == 7
    nb = 7 if is_l5 else 11
    resc = {}
    for b in range(1, nb + 1):
        mult = (7.0 + b * 0.31 + int(d) % 7 * 0.01) / 10.0
        add = -(3.0 + b * 0.17) / 10.0
        resc[f"RADIANCE_MULT_BAND_{b}"] = f"{mult:.4E}"
        resc[f"RADIANCE_ADD_BAND_{b}"] = f"{add:.5f}"
    if is_l5:
        therm = {"K1_CONSTANT_BAND_6": "607.76", "K2_CONSTANT_BAND_6": "1260.56"}
    else:
        therm = {"K1_CONSTANT_BAND_10": "774.8853", "K2_CONSTANT_BAND_10": "1321.0789"}
    meta = {"LANDSAT_METADATA_FILE": {
        "LEVEL1_RADIOMETRIC_RESCALING": resc,
        "LEVEL1_THERMAL_CONSTANTS": therm,
        "IMAGE_ATTRIBUTES": {"SPACECRAFT_ID": "LANDSAT_5" if is_l5 else "LANDSAT_8",
                             "DATE_ACQUIRED": f"{d[:4]}-{d[4:6]}-{d[6:8]}"}}}
    with open(f"{ROOT}/metadatas/{sid}_MTL_metadata.json", "w") as f:
        json.dump(meta, f, indent=2)

# --- scene tensors as JSONL: bands = nbands x 49 ints (7x7 windows) ------
with open(f"{ROOT}/scenes/scenes.jsonl", "w") as f:
    for sid, nbands, d in scenes:
        bands = []
        for b in range(nbands):
            base = (sum(ord(c) for c in sid) + b * 97) % 200
            bands.append([(base + (p * 13 + b * 7) % 55) for p in range(49)])
        f.write(json.dumps({"scene_id": sid, "bands": bands}) + "\n")

# --- small binary blobs (S5 / multimodal stub inputs) --------------------
for i in range(4):
    with open(f"{ROOT}/binary/blob_{i}.bin", "wb") as f:
        f.write(struct.pack("<I", 0x47464154) +
                bytes((i * 37 + j * 11) % 256 for j in range(64 + i * 32)))

print("fixtures written to", os.path.abspath(ROOT))
