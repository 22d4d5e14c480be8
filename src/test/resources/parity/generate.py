# Regenerates reference_outputs.json by running the REFERENCE'S OWN eval
# functions (/root/reference/utils/evaluate_funcs.py) under CPython with
# torch/transformers/tqdm stubbed. Seed fixed at 20260816.
# Usage: python3 generate.py  (writes reference_outputs.json next to itself)
import sys, types, json, random, os

torch = types.ModuleType('torch'); torch.utils = types.ModuleType('torch.utils')
tud = types.ModuleType('torch.utils.data')
for n in ['TensorDataset', 'DataLoader', 'RandomSampler', 'SequentialSampler']:
    setattr(tud, n, object)
torch.utils.data = tud
sys.modules['torch'] = torch; sys.modules['torch.utils'] = torch.utils
sys.modules['torch.utils.data'] = tud
tr = types.ModuleType('transformers'); tr.BertTokenizer = object
sys.modules['transformers'] = tr
tq = types.ModuleType('tqdm'); tq.tqdm = lambda x, *a, **k: x; tq.trange = range
sys.modules['tqdm'] = tq

sys.path.insert(0, '/root/reference')
from utils.evaluate_funcs import get_indices_from_lable, rectify_indices, \
    get_blurred_match_count, get_index_number, compute_performance, cal_triple_res

rng = random.Random(20260816)
out = {"indices": [], "rectify": [], "blurred": [], "index_number": []}

bids = [2, 4, 6, 8, 10, 12, 30]
for _ in range(120):
    b = rng.choice(bids)
    label = [rng.choice([0, 1, b, b + 1]) for _ in range(rng.randint(0, 30))]
    out["indices"].append({"label": label, "b": b,
        "expected": get_indices_from_lable(label, b)})

chars = list("甲乙丙丁（）。xyz")
for _ in range(60):
    ctx = ''.join(rng.choice(chars) for _ in range(rng.randint(5, 25)))
    pred = []
    for _ in range(rng.randint(1, 3)):
        s = rng.randint(0, max(len(ctx) - 2, 0)); e = rng.randint(s + 1, len(ctx))
        pred.append([s, e])
    gl = rng.randint(1, 2)
    out["rectify"].append({"context": ctx, "pred": pred, "goldLen": gl,
        "expected": rectify_indices(ctx, [p[:] for p in pred], gl)})

for _ in range(40):
    g = [[rng.randint(0, 20), rng.randint(0, 20)] for _ in range(rng.randint(0, 2))]
    p = [[rng.randint(0, 20), rng.randint(0, 20)] for _ in range(rng.randint(0, 2))]
    out["blurred"].append({"gold": g, "pred": p,
        "expected": get_blurred_match_count(g, p)})

for _ in range(30):
    row = [rng.choice([0, 0, 0, 4, 5, 8]) for _ in range(rng.randint(0, 15))]
    out["index_number"].append({"gold": row, "expected": get_index_number([row])[0]})

samples = []
for _ in range(80):
    b = rng.choice(bids)
    L = 24
    pos = rng.random() < 0.6
    gold = [0] * L
    if pos:
        for _ in range(rng.randint(1, 2)):
            s = rng.randint(0, L - 4); ln = rng.randint(1, 3)
            gold[s] = b
            for j in range(s + 1, min(s + ln, L)): gold[j] = b + 1
    r = rng.random()
    if r < 0.4: pred = gold[:]
    elif r < 0.6: pred = [1] * L
    elif r < 0.8:
        pred = [0] * L; s = rng.randint(0, L - 4); pred[s] = b; pred[s + 1] = b + 1
    else: pred = [rng.choice([0, 1, b, b + 1]) for _ in range(L)]
    samples.append({"type": b, "gold": gold, "pred": pred})

acc, prec, rec, f1 = compute_performance(
    [s["pred"] for s in samples], [s["gold"] for s in samples],
    None, [s["type"] for s in samples], None, sign='dev')
out["perf"] = {"samples": samples, "acc": acc, "precision": prec,
               "recall": rec, "f1": f1}

docs = []
for i in range(30):
    gold_spo = [{"s": f"e{i}-{j}"} for j in range(rng.randint(0, 3))]
    pred_spo = [dict(x) for x in gold_spo]
    if rng.random() < 0.3 and pred_spo: pred_spo[0] = {"s": "WRONG"}
    if rng.random() < 0.2: pred_spo.append({"s": "EXTRA"})
    docs.append((gold_spo, pred_spo))
with open('/tmp/parity_g.jsonl', 'w') as f:
    for g, _ in docs: f.write(json.dumps({"text": "t", "spo_list": g}) + "\n")
with open('/tmp/parity_p.jsonl', 'w') as f:
    for _, p in docs: f.write(json.dumps({"text": "t", "spo_list": p}) + "\n")
mc, precT = cal_triple_res('/tmp/parity_g.jsonl', '/tmp/parity_p.jsonl')
out["triple_res"] = {"docs": [
    {"gold": [x["s"] for x in g], "pred": [x["s"] for x in p]} for g, p in docs],
    "match_count": mc, "precision": precT}

# T1/T2/T3 byte-identity: run the reference's clean_data + process_sent on
# randomized adversarial mixes (urls, paren runs, mixed-width punctuation,
# unicode whitespace) — draws APPENDED after all prior sections so the rng
# stream for the earlier fixtures is unchanged.
from data.data_utils import clean_data
from data.apply_text_norm import process_sent

frag = ["肿物", "结节", "见图", "大小", "abc", "XY12", "１２３", "ＡＢＣｚ",
        "“引”", "‘单’", "《书》", "「框」", "（", "）", "(", ")", ",", "，",
        "。", "！", "？", "：", "~", "～", "＠", "#", "*", "##", "**", "#*#*",
        " ", "  ", "\t", "\n", "　", "　　", "-", "+=", "；", "【】",
        "（/topics/zh-cn/17）", "（http://www.cdc.gov/a.html）",
        "targetUrl=http://a.b/c）", "（/x）", "（httpX）",
        "http://bare.url/x", "targetUrl=http没）"]
out["textnorm"] = []
for _ in range(300):
    s = ''.join(rng.choice(frag) for _ in range(rng.randint(0, 12)))
    out["textnorm"].append(
        {"in": s, "clean": clean_data(s), "process": process_sent(s)})

dst = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'reference_outputs.json')
with open(dst, 'w') as f:
    json.dump(out, f, ensure_ascii=False)
print("wrote", dst)
