#!/usr/bin/env python3
"""Generate torch-format .pt fixture files (zip + protocol-2 pickle +
little-endian int32 storage) WITHOUT torch, by emitting the exact byte layout
torch.save produces for a single IntTensor (observed structure documented in
SURVEY.md §1.1: shape (bands, stations, 7, 7), IntStorage).

Also writes a sidecar CSV of expected per-scene checksums (after the
reference's permute(1,0,2,3)) that serves as the DuckDB oracle for the
ingest query.
"""
import os, struct, zipfile, zlib

ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "tensors")
os.makedirs(ROOT, exist_ok=True)

def binunicode(s):
    b = s.encode()
    return b"X" + struct.pack("<I", len(b)) + b

def binint(n):
    if n < 256:
        return b"K" + struct.pack("<B", n)
    if n < 65536:
        return b"M" + struct.pack("<H", n)
    return b"J" + struct.pack("<i", n)

def make_pickle(key, numel, shape, stride):
    out = b"\x80\x02"                                   # PROTO 2
    out += b"ctorch._utils\n_rebuild_tensor_v2\nq\x00"   # GLOBAL + BINPUT
    out += b"("                                          # MARK (outer args)
    out += b"("                                          # MARK (persid tuple)
    out += binunicode("storage") + b"q\x01"
    out += b"ctorch\nIntStorage\nq\x02"
    out += binunicode(key) + b"q\x03"
    out += binunicode("cpu") + b"q\x04"
    out += binint(numel)
    out += b"tq\x05"                                     # TUPLE + BINPUT
    out += b"Q"                                          # BINPERSID
    out += binint(0)                                     # storage_offset
    out += b"(" + b"".join(binint(d) for d in shape) + b"tq\x06"
    out += b"(" + b"".join(binint(d) for d in stride) + b"tq\x07"
    out += b"\x89"                                       # NEWFALSE
    out += b"ccollections\nOrderedDict\nq\x08"
    out += b")Rq\x09"                                    # EMPTY_TUPLE REDUCE
    out += b"tq\x0a"                                     # close outer args
    out += b"Rq\x0b."                                    # REDUCE BINPUT STOP
    return out

scenes = [
    ("LT05_L1TP_174038_20060103_20200831_02_T1", 7, 5),
    ("LC08_L1TP_175037_20140628_20200911_02_T1", 11, 4),
    ("LC09_L1TP_174038_20230110_20230215_02_T1", 11, 6),
]

rows = []
for sid, nbands, nstations in scenes:
    numel = nbands * nstations * 49
    shape = (nbands, nstations, 7, 7)
    stride = (nstations * 49, 49, 7, 1)
    data = [(sum(ord(c) for c in sid) + i * 31) % 997 for i in range(numel)]
    pkl = make_pickle("0", numel, shape, stride)
    path = os.path.join(ROOT, sid + ".pt")
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        z.writestr(f"{sid}/data.pkl", pkl)
        z.writestr(f"{sid}/data/0", b"".join(struct.pack("<i", v) for v in data))
        z.writestr(f"{sid}/version", b"3\n")
    # expected: permute(1,0,2,3) -> (stations, bands, 7, 7); flatten order
    # station-major; dot with 1-based global index
    t_sum = 0
    t_dot = 0
    idx = 1
    for s in range(nstations):
        for b in range(nbands):
            for p in range(49):
                v = data[b * stride[0] + s * stride[1] + p]
                t_sum += v
                t_dot += v * idx
                idx += 1
    rows.append((sid, nbands, nstations, t_sum, t_dot))

with open(os.path.join(ROOT, "expected.csv"), "w") as f:
    f.write("scene_id,nbands,n_stations,t_sum,t_dot\n")
    for r in rows:
        f.write(",".join(str(x) for x in r) + "\n")
print("wrote", len(scenes), ".pt fixtures +", os.path.join(ROOT, "expected.csv"))
