#!/usr/bin/env python3
# -*- coding: utf-8 -*-
"""Golden-fixture generator (run once; outputs are committed).

Synthesizes a deterministic (seed 42) corpus of judgment-shaped documents as
interleaved text+media span arrays (FIXTURES.md §1/§3), then derives golden
outputs by RUNNING the reference extractor at /root/reference (its behavior
is the spec — see SURVEY.md §5). Tests never regenerate.

Outputs:
  src/test/resources/fixtures/docs/<archetype>/<doc_id>.json
  src/test/resources/fixtures/golden/records/<doc_id>.json
  src/test/resources/fixtures/golden/spans/<doc_id>.json
  src/test/resources/fixtures/golden/report.json
"""
import json
import logging
import random
import sys
from pathlib import Path

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/src")
logging.disable(logging.CRITICAL)

from src.extractor import DocumentExtractor  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/fixtures"

rng = random.Random(42)

SURNAMES = ["WONG", "CHAN", "LEE", "CHEUNG", "LAM", "NG", "HO", "TANG", "YUEN", "LAU"]
GIVEN = ["TAI MAN", "SIU MING", "KA HO", "WAI YIN", "CHI KEUNG", "MEI LING",
         "KWOK WING", "YUK LAN", "CHUN KIT", "HOI YAN"]
COMPANIES = ["GOLDEN DRAGON TRADING LIMITED", "EVERBRIGHT LOGISTICS LIMITED",
             "SUNRISE PROPERTY HOLDINGS LIMITED", "HARBOUR VIEW ENGINEERING LIMITED",
             "PEARL RIVER GARMENTS LIMITED", "FORTUNE STAR ELECTRONICS LIMITED",
             "JADE PHOENIX CATERING LIMITED", "VICTORIA PEAK FINANCE LIMITED"]
JUDGES = ["Anthony Chan", "Peter Wong", "David Lok", "Queeny Au Yeung",
          "Wilson Chan", "Godfrey Lam", "Mimmie Chan", "Keith Yeung"]
LAWYERS = [("Mr John Tse", "Wong & Co"), ("Ms Mary Cheung", "Lee Partners"),
           ("Mr Kevin Lau", "Deacons Chambers"), ("Ms Fiona Ng", "Pacific Solicitors"),
           ("Mr Samuel Ho", "Temple Chambers"), ("Ms Grace Lam", "Central Law Office")]
ZH_NAMES = ["陳大文", "黃小明", "李志強", "張美玲", "劉國輝", "吳雅芝", "鄭家豪", "林淑儀"]
ZH_JUDGES = ["廖文健", "歐陽桂如", "陳嘉信", "黃國瑛"]

FILLER = [
    "The parties entered into a written agreement for the supply of goods and services in Hong Kong.",
    "It is common ground that the consignment was delivered to the warehouse on the agreed date.",
    "The defendant disputes the quality of the goods and relies on the inspection report.",
    "Counsel referred the court to a number of authorities on the construction of commercial contracts.",
    "The correspondence between the parties shows a protracted negotiation over the outstanding invoices.",
    "The witness gave evidence that the shipment was inspected upon arrival at the container terminal.",
    "There was a dispute as to whether the oral variation was ever agreed between the parties.",
    "The burden of proof lies on the party asserting the affirmative of the issue.",
    "The court must consider the contemporaneous documents in assessing the credibility of the witnesses.",
    "The invoices were issued monthly and payment was due within thirty days of each invoice.",
]
ZH_FILLER = [
    "本案涉及雙方就貨物買賣合約所產生的糾紛，原告人聲稱被告人未有依約付款。",
    "雙方於合約中訂明貨物須於指定日期前交付至香港的倉庫。",
    "被告人對貨物的品質提出爭議，並依賴檢驗報告作為證據。",
    "法庭須考慮同期文件以評估證人的可信性。",
    "雙方之間的書信往來顯示就未付發票進行了長時間的商議。",
]


def person(rng):
    return f"{rng.choice(SURNAMES)} {rng.choice(GIVEN)}"


def body_pages(rng, n, claim_amt=None, seed_words=True):
    pages = []
    for p in range(n):
        paras = []
        for _ in range(rng.randint(2, 4)):
            k = rng.randint(2, 5)
            paras.append(" ".join(rng.choice(FILLER) for _ in range(k)))
        if claim_amt and p == 0:
            paras.insert(0, "The plaintiff claims damages and seeks payment of "
                            f"the sum of HK${claim_amt:,} together with interest thereon.")
        pages.append("\n\n".join(paras))
    return pages


def hca_between(rng, idx, split_year=False):
    num = rng.randint(1, 2999)
    year = rng.randint(2015, 2024)
    doc_id = f"HCA{num:06d}_{year}"
    n_pl = rng.randint(1, 3)
    n_df = rng.randint(1, 3)
    plaintiffs = [person(rng) if rng.random() < 0.6 else rng.choice(COMPANIES) for _ in range(n_pl)]
    defendants = [person(rng) if rng.random() < 0.4 else rng.choice(COMPANIES) for _ in range(n_df)]
    judge = rng.choice(JUDGES)
    claim = rng.randrange(200_000, 9_000_000, 1000)
    judgment = int(claim * rng.choice([0.5, 0.75, 1.0]))
    (law1, firm1), (law2, firm2) = rng.sample(LAWYERS, 2)

    action = f"ACTION NO {num} OF {year}"
    if split_year:
        ys = str(year)
        action = f"ACTION NO {num} OF {ys[:2]} {ys[2:]}"

    hdr = [f"HCA {num}/{year}",
           "IN THE HIGH COURT OF THE",
           "HONG KONG SPECIAL ADMINISTRATIVE REGION",
           "COURT OF FIRST INSTANCE",
           action,
           "____________",
           "BETWEEN"]
    if n_pl == 1:
        hdr += [f"  {plaintiffs[0]}", "  Plaintiff"]
    else:
        for i, p in enumerate(plaintiffs, 1):
            sfx = {1: "st", 2: "nd", 3: "rd"}.get(i, "th")
            hdr += [f"  {p}", f"  {i}{sfx} Plaintiff"]
    hdr += [" and "]
    if n_df == 1:
        hdr += [f"  {defendants[0]}", "  Defendant"]
    else:
        for i, d in enumerate(defendants, 1):
            sfx = {1: "st", 2: "nd", 3: "rd"}.get(i, "th")
            hdr += [f"  {d}", f"  {i}{sfx} Defendant"]
    hdr += ["____________",
            f"Before: Hon {judge} J in Chambers",
            f"Date of Hearing: {rng.randint(1, 28)} May {year}",
            f"Date of Judgment: {rng.randint(1, 28)} June {year}",
            "____________",
            "J U D G M E N T"]
    page0 = "\n".join(hdr)

    intro = ("Introduction\n"
             "This action arises out of a commercial dispute between the parties.\n"
             "The plaintiff seeks to recover sums said to be due under a supply agreement.\n"
             "The defendant denies liability and counterclaims for set-off.\n"
             "The principal question is whether the goods conformed to the contract.\n")
    pages = [page0, intro] + body_pages(rng, rng.randint(4, 10), claim_amt=claim)

    order_page = ("ORDER\n"
                  f"1. Judgment be entered for the plaintiff in the sum of HK${judgment:,}.\n"
                  "2. The defendant do pay the plaintiff interest at the judgment rate.\n"
                  f"3. Costs of the action be paid by the defendant, summarily assessed at HK${rng.randrange(50_000, 400_000, 1000):,}.\n")
    footer = (f"{law1}, instructed by {firm1}, for the plaintiff\n"
              f"{law2}, instructed by {firm2}, for the defendant")
    pages += [order_page, footer]
    return doc_id, pages


def dccj_direct(rng, idx):
    num = rng.randint(1, 999)
    year = rng.randint(2015, 2023)
    doc_id = f"DCCJ{num:06d}_{year}"
    pl = rng.choice(COMPANIES)
    df = rng.choice([c for c in COMPANIES if c != pl])
    judge = rng.choice(JUDGES)
    claim = rng.randrange(80_000, 900_000, 500)
    page0 = "\n".join([
        f"DCCJ {num}/{year}",
        "IN THE DISTRICT COURT OF THE",
        "HONG KONG SPECIAL ADMINISTRATIVE REGION",
        f"CIVIL ACTION NO {num} OF {year}",
        "____________",
        "BETWEEN",
        f"  {pl}",
        "  Plaintiff",
        " and ",
        f"  {df}",
        "  Defendant",
        "____________",
        f"Before: His Honour Judge {judge.split()[-1]} in Court",
        f"Date of Trial: {rng.randint(1, 28)} March {year}",
        "J U D G M E N T",
    ])
    pages = [page0] + body_pages(rng, rng.randint(3, 6), claim_amt=claim)
    pages.append("JUDGMENT\n"
                 f"1. The claim is allowed. The defendant shall pay the plaintiff HK${claim:,}.\n"
                 "2. Costs be taxed if not agreed.\n")
    law, firm = rng.choice(LAWYERS)
    pages.append(f"{law}, instructed by {firm}, for the plaintiff\n"
                 "The defendant was not represented and did not appear.")
    return doc_id, pages


def margin_index_noise(rng, idx, protected=False):
    base_id, pages = hca_between(rng, idx)
    doc_id = base_id.replace("HCA", "HCAM") if not protected else base_id.replace("HCA", "HCAP")
    letters = [chr(ord('A') + (i % 26)) for i in range(rng.randint(55, 70))]
    if protected:
        # index run short + content within first 50 lines → protection path
        noise = "\n".join(letters[:20])
    else:
        noise = "\n".join(letters)
    pages = [noise] + pages
    return doc_id, pages


def chinese_judgment(rng, idx):
    num = rng.randint(1, 1999)
    year = rng.randint(2016, 2024)
    doc_id = f"HCA{num:06d}_{year}C"
    pl = rng.choice(ZH_NAMES)
    df = rng.choice([n for n in ZH_NAMES if n != pl])
    judge = rng.choice(ZH_JUDGES)
    page0 = "\n".join([
        f"HCA {num}/{year}",
        "香港特別行政區",
        "高等法院原訟法庭",
        f"民事訴訟 {year} 年第 {num} 號",
        "____________",
        f"原告人 {pl}",
        "及",
        f"被告人 {df}",
        "____________",
        f"主審法官：{judge}",
        f"聆訊日期：{year} 年 {rng.randint(1,12)} 月 {rng.randint(1,28)} 日",
        "判 案 書",
    ])
    pages = [page0]
    for _ in range(rng.randint(2, 5)):
        paras = [rng.choice(ZH_FILLER) for _ in range(rng.randint(2, 4))]
        pages.append("\n\n".join(paras))
    footer = "\n".join([
        f"( {judge} )",
        "高等法院原訟法庭法官",
        "",
        f"原告人：{pl}",
        f"第一被告人：{df}",
        "原告人：無律師代表，親自行事" if rng.random() < 0.5 else f"原告人：由{rng.choice(ZH_NAMES)}律師代表",
    ])
    pages.append(footer)
    return doc_id, pages


def corrigendum(rng, idx):
    num = rng.randint(1, 2999)
    year = rng.randint(2016, 2024)
    doc_id = f"HCA{num:06d}_{year}R"
    day = rng.randint(1, 28)
    page0 = "\n".join([
        f"HCA {num}/{year}",
        "IN THE HIGH COURT OF THE",
        "HONG KONG SPECIAL ADMINISTRATIVE REGION",
        "COURT OF FIRST INSTANCE",
        f"ACTION NO {num} OF {year}",
        "C O R R I G E N D U M",
        f"Please note the following corrigendum in the Judgment dated {day} April {year}:",
        f'At page 3, line 12, "{rng.choice(SURNAMES)} Limited" be corrected to "{rng.choice(COMPANIES)}"',
        f"Date of Corrigendum: {rng.randint(1, 28)} May {year}",
    ])
    return doc_id, [page0]


def amounts_multi(rng, idx):
    base_id, pages = hca_between(rng, idx)
    doc_id = base_id.replace("HCA", "HCAX")
    pages.insert(2, "The plaintiff further claims the sum of USD 120,000.00 as damages "
                    "for the second consignment, together with the outstanding balance of "
                    "HK$3,400,000 due and owing under the facility letter.")
    pages.insert(len(pages) - 1,
                 "For these reasons, the defendant is ordered to pay the plaintiff "
                 "HK$2,000,000 plus interest. Costs assessed at HK$150,000.")
    return doc_id, pages


def oversized(rng, idx):
    base_id, pages = hca_between(rng, idx)
    doc_id = base_id.replace("HCA", "HCAZ")
    extra = body_pages(rng, 180)
    pages = pages[:-2] + extra + pages[-2:]
    return doc_id, pages


def garbage(rng, idx):
    doc_id = f"MISC{idx:04d}_2020"
    k = rng.randint(1, 3)
    pages = [" ".join(rng.choice(["lorem", "ipsum", "dolor", "sit", "amet",
                                  "zzz", "qqq", "xyzzy"]) for _ in range(rng.randint(20, 80)))
             for _ in range(k)]
    return doc_id, pages


def empty_doc(rng, idx):
    return f"EMPTY{idx:04d}_2020", [""]


def judge_formats(rng, idx):
    """Special judge formats: Recorder / Master / Deputy / signature block."""
    base_id, pages = hca_between(rng, idx)
    doc_id = base_id.replace("HCA", "HCAJ")
    variant = rng.randint(0, 3)
    judge_line = [
        "Before: Mr. Recorder Manzoni Kwan, SC in Court",
        "Before: Master Isaac Chan in Chambers",
        "Before: Deputy High Court Judge Wong Kai Ming in Court",
        "Before: The Hon. Peter David Lok J. in Chambers",
    ][variant]
    # replace the Before: line on page 0
    lines = pages[0].split("\n")
    lines = [judge_line if l.startswith("Before:") else l for l in lines]
    pages[0] = "\n".join(lines)
    if variant == 0:
        pages.append("( Manzoni Kwan ) Recorder of the High Court")
    elif variant == 2:
        pages.append("( Wong Kai Ming ) Deputy High Court Judge of the Court of First Instance")
    return doc_id, pages


def multi_date(rng, idx):
    """Messy hearing-date lines exercising the 11-step cleaning chain."""
    base_id, pages = hca_between(rng, idx)
    doc_id = base_id.replace("HCA", "HCAD")
    y = rng.randint(2016, 2023)
    variant = rng.randint(0, 3)
    date_line = [
        f"Dates of Hearing: {rng.randint(1,9)}, {rng.randint(10,19)} and {rng.randint(20,28)} March {y} and",
        f"Date of Judgment: {rng.randint(1,28)} June {y} - 3 - Reasons for Judgment",
        f"Date of Decision: {rng.randint(1,28)} May {y} Before Hon Chan J",
        f"Date of Hearing: {rng.randint(1,28)} April {y}, ,",
    ][variant]
    lines = pages[0].split("\n")
    lines = [date_line if l.startswith("Date of Hearing:") else l for l in lines]
    pages[0] = "\n".join(lines)
    return doc_id, pages


def and_in_name(rng, idx):
    """Company names containing ' AND ' stressing the BETWEEN split."""
    num = rng.randint(1, 2999)
    year = rng.randint(2016, 2023)
    doc_id = f"HCAN{num:06d}_{year}"
    pl = "GOLDEN DRAGON TRADING AND SHIPPING LIMITED"
    df = rng.choice(COMPANIES)
    judge = rng.choice(JUDGES)
    page0 = "\n".join([
        f"HCA {num}/{year}",
        "IN THE HIGH COURT OF THE",
        "HONG KONG SPECIAL ADMINISTRATIVE REGION",
        "COURT OF FIRST INSTANCE",
        f"ACTION NO {num} OF {year}",
        "____________",
        "BETWEEN",
        f"  {pl}",
        "  Plaintiff",
        " and ",
        f"  {df}",
        "  Defendant",
        "____________",
        f"Before: Hon {judge} J in Chambers",
        f"Date of Hearing: {rng.randint(1,28)} May {year}",
        "J U D G M E N T",
    ])
    pages = [page0] + body_pages(rng, rng.randint(3, 6), claim_amt=rng.randrange(100_000, 2_000_000, 1000))
    pages.append("ORDER\n1. The action is dismissed with costs to the defendant.\n")
    law, firm = rng.choice(LAWYERS)
    pages.append(f"{law}, instructed by {firm}, for the plaintiff")
    return doc_id, pages


def corrigendum_variants(rng, idx):
    """Corrigendum fallback branches: 'should read', 'names added', bare."""
    num = rng.randint(1, 2999)
    year = rng.randint(2016, 2024)
    doc_id = f"HCA{num:06d}_{year}V"
    variant = rng.randint(0, 2)
    body = [
        f'Paragraph 12 should read: "the defendant shall pay interest at 8%"',
        "The names of Counsel for the 2nd Defendant are added to the representation section.",
        "Minor typographical errors are corrected throughout the judgment.",
    ][variant]
    page0 = "\n".join([
        f"HCA {num}/{year}",
        "IN THE HIGH COURT OF THE",
        "HONG KONG SPECIAL ADMINISTRATIVE REGION",
        "COURT OF FIRST INSTANCE",
        f"ACTION NO {num} OF {year}",
        "C O R R I G E N D U M",
        f"Please note the following corrigendum in the Decision dated {rng.randint(1,28)} March {year}:",
        body,
    ])
    return doc_id, [page0]


def chinese_variants(rng, idx):
    """Chinese-path edges: lawyer-info footers that must be rejected as
    party names, 案件編號/編號 prefix case numbers, bare signature judges,
    missing dates (hard-coded fallback)."""
    num = rng.randint(1, 1999)
    year = rng.randint(2016, 2024)
    doc_id = f"HCA{num:06d}_{year}W"
    pl = rng.choice(ZH_NAMES)
    df = rng.choice([n for n in ZH_NAMES if n != pl])
    judge = rng.choice(ZH_JUDGES)
    variant = rng.randint(0, 3)

    case_line = [
        f"民事訴訟 {year} 年第 {num} 號",
        f"案件編號：{year}年第{num}號",
        f"編號：{year}年第{num}號",
        f"高院民事訴訟 {year} 年 第 {num} 號",
    ][variant]

    header = ["香港特別行政區", "高等法院原訟法庭", case_line, "____________",
              f"原告人 {pl}", "及", f"被告人 {df}", "____________"]
    if variant != 3:
        header.append(f"聆訊日期：{year} 年 {rng.randint(1,12)} 月 {rng.randint(1,28)} 日")
    # variant 3: no date anywhere → exercises the hard-coded fallback
    header.append("判 案 書")
    page0 = "\n".join(header)

    body = []
    for _ in range(rng.randint(2, 4)):
        body.append("\n\n".join(rng.choice(ZH_FILLER) for _ in range(rng.randint(2, 3))))

    footer_lines = []
    if variant in (0, 2):
        footer_lines += [f"( {judge} )", "高等法院原訟法庭法官"]
    else:
        footer_lines += [f"{judge} 高等法院原訟法庭暫委法官"]
    footer_lines += ["", f"原告人：{pl}"]
    if variant == 1:
        # lawyer-info line FIRST for the defendant — must be rejected as a
        # party name by _is_lawyer_info and picked up as the lawyer instead
        footer_lines += [f"第一被告人：由{rng.choice(ZH_NAMES)}律師代表"]
    else:
        footer_lines += [f"第一被告人：{df}"]
    if variant == 2:
        footer_lines += ["原告人：無律師代表，親自行事"]
    body.append("\n".join(footer_lines))
    return doc_id, [page0] + body


def many_defendants(rng, idx):
    """>=10 defendants: ordinal suffixes beyond 3rd and the parser/format
    cap paths (numbered-party parser, formatPartiesSmart budgets)."""
    num = rng.randint(1, 2999)
    year = rng.randint(2016, 2023)
    doc_id = f"HCAB{num:06d}_{year}"
    pl = rng.choice(COMPANIES)
    n_df = rng.randint(10, 13)
    defendants = [person(rng) if rng.random() < 0.5 else rng.choice(COMPANIES)
                  for _ in range(n_df)]
    judge = rng.choice(JUDGES)
    hdr = [f"HCA {num}/{year}",
           "IN THE HIGH COURT OF THE",
           "HONG KONG SPECIAL ADMINISTRATIVE REGION",
           "COURT OF FIRST INSTANCE",
           f"ACTION NO {num} OF {year}",
           "____________",
           "BETWEEN",
           f"  {pl}",
           "  Plaintiff",
           " and "]
    for i, d in enumerate(defendants, 1):
        sfx = {1: "st", 2: "nd", 3: "rd"}.get(i if i < 20 else i % 10, "th")
        if 10 <= i <= 20:
            sfx = "th"
        hdr += [f"  {d}", f"  {i}{sfx} Defendant"]
    hdr += ["____________",
            f"Before: Hon {judge} J in Chambers",
            f"Date of Hearing: {rng.randint(1, 28)} May {year}",
            "J U D G M E N T"]
    pages = ["\n".join(hdr)] + body_pages(rng, rng.randint(3, 5),
                                          claim_amt=rng.randrange(500_000, 5_000_000, 1000))
    pages.append("ORDER\n1. The claims against all defendants are dismissed.\n")
    law, firm = rng.choice(LAWYERS)
    pages.append(f"{law}, instructed by {firm}, for the plaintiff")
    return doc_id, pages


def and_in_defendant(rng, idx):
    """' AND ' inside the DEFENDANT company name: the BETWEEN splitter takes
    the FIRST '\\s+AND\\s+' match (src/extractor.py:772-781), so an AND-named
    defendant stresses the defendant-side section boundaries too."""
    num = rng.randint(1, 2999)
    year = rng.randint(2016, 2023)
    doc_id = f"HCAC{num:06d}_{year}"
    pl = rng.choice([p for p in COMPANIES if " AND " not in p])
    df = rng.choice(["SMITH AND SONS ENGINEERING LIMITED",
                     "LEE AND CHAN PROPERTY AGENCY LIMITED"])
    judge = rng.choice(JUDGES)
    page0 = "\n".join([
        f"HCA {num}/{year}",
        "IN THE HIGH COURT OF THE",
        "HONG KONG SPECIAL ADMINISTRATIVE REGION",
        "COURT OF FIRST INSTANCE",
        f"ACTION NO {num} OF {year}",
        "____________",
        "BETWEEN",
        f"  {pl}",
        "  Plaintiff",
        " and ",
        f"  {df}",
        "  Defendant",
        "____________",
        f"Before: Hon {judge} J in Chambers",
        f"Date of Hearing: {rng.randint(1, 28)} June {year}",
        "J U D G M E N T",
    ])
    pages = [page0] + body_pages(rng, rng.randint(3, 5),
                                 claim_amt=rng.randrange(100_000, 3_000_000, 1000))
    pages.append("ORDER\n1. Judgment for the plaintiff with costs.\n")
    law, firm = rng.choice(LAWYERS)
    pages.append(f"{law}, instructed by {firm}, for the plaintiff")
    return doc_id, pages


def mixed_currency_judgment(rng, idx):
    """Judgment amounts in two currencies → the cross-currency max-by-value
    branch (src/extractor.py:2586-2589) on the judgment_amount path."""
    base_id, pages = hca_between(rng, idx)
    doc_id = base_id.replace("HCA", "HCAY")
    # overlapping ranges so either currency can carry the max (the
    # reference compares raw numeric values with no FX conversion)
    usd = rng.randrange(500_000, 9_000_000, 1000)
    hkd = rng.randrange(500_000, 9_000_000, 1000)
    pages.insert(len(pages) - 1,
                 "For the foregoing reasons the defendant shall pay the plaintiff "
                 f"USD {usd:,} under the first agreement and a further judgment sum of "
                 f"HK${hkd:,} under the facility letter, together with interest.")
    return doc_id, pages


def amounts_scaled(rng, idx):
    """Scaled and decimal amount forms: 'HK$1.5 million', 'USD 2 billion',
    decimal cents — the unit-scaling branches of _parse_amount_match and the
    f'{v:,.0f}' rounding, end-to-end through window scoring."""
    base_id, pages = hca_between(rng, idx)
    doc_id = base_id.replace("HCA", "HCAS")
    variant = rng.randint(0, 2)
    claim_line = [
        f"The plaintiff claims the sum of HK${rng.randint(1, 9)}.{rng.randint(1, 9)} million "
        "as damages for breach of the supply agreement.",
        f"The plaintiff seeks recovery of USD {rng.randint(2, 8)} million together with interest.",
        f"The outstanding balance of HK${rng.randrange(100_000, 900_000)}.{rng.randint(10, 99)} "
        "remains due and owing under the invoices.",
    ][variant]
    pages.insert(2, claim_line)
    order_line = [
        f"The defendant shall pay the plaintiff HK${rng.randint(1, 4)}.{rng.randint(1, 9)} million "
        "plus interest at the judgment rate.",
        f"Judgment is entered for the plaintiff in the sum of USD {rng.randint(1, 3)} million.",
        f"Costs summarily assessed at HK${rng.randrange(50_000, 400_000)}.{rng.randint(10, 99)}.",
    ][variant]
    pages.insert(len(pages) - 1, order_line)
    return doc_id, pages


ARCHETYPES = [
    ("hca_between", lambda r, i: hca_between(r, i), 10),
    ("hca_split_year", lambda r, i: hca_between(r, i, split_year=True), 4),
    ("dccj_direct", dccj_direct, 8),
    ("margin_index_noise", lambda r, i: margin_index_noise(r, i), 4),
    ("margin_index_protected", lambda r, i: margin_index_noise(r, i, protected=True), 2),
    ("chinese_judgment", chinese_judgment, 8),
    ("corrigendum", corrigendum, 4),
    ("amounts_multi", amounts_multi, 4),
    ("oversized_skew", oversized, 2),
    ("garbage", garbage, 3),
    ("empty", empty_doc, 2),
    # appended after round-1 initial corpus — earlier rng stream unchanged
    ("judge_formats", judge_formats, 6),
    ("multi_date", multi_date, 6),
    ("and_in_name", and_in_name, 4),
    ("corrigendum_variants", corrigendum_variants, 5),
    ("chinese_variants", chinese_variants, 8),
    # appended round 2 (VERDICT item 10) — earlier rng stream unchanged
    ("many_defendants", many_defendants, 4),
    ("and_in_defendant", and_in_defendant, 4),
    ("mixed_currency_judgment", mixed_currency_judgment, 4),
    ("amounts_scaled", amounts_scaled, 6),
]


def make_spans(rng, doc_id, pages):
    """Interleave media spans (~20% of docs get 1-3 media refs)."""
    spans = []
    media_n = 0
    for p in pages:
        spans.append({"kind": "text", "text": p, "media_ref": "", "offset": 0})
        if rng.random() < 0.15:
            media_n += 1
            spans.append({"kind": "media", "text": "",
                          "media_ref": f"img://{doc_id}/{media_n}", "offset": 0})
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


def full_text(spans):
    return "".join(s["text"] + "\n" for s in spans if s["kind"] == "text")


def out_spans(extractor, doc_id, spans):
    """Mirror of graft.extract.ExtractAll.outSpans (the span-level contract)."""
    raw = full_text(spans)
    cleaned = extractor._clean_pdf_index_artifacts(raw) if raw else raw
    cut = len(raw) - len(cleaned)
    if cut < 0 or not raw.endswith(cleaned):
        cut = 0
    out = []
    consumed = 0
    for s in spans:
        if s["kind"] == "media":
            out.append(s)
        else:
            contrib = len(s["text"]) + 1
            drop = max(0, min(contrib, cut - consumed))
            consumed += contrib
            if drop < contrib:
                kept = s["text"][min(len(s["text"]), drop):]
                out.append({**s, "text": kept})
    return {"doc_id": doc_id, "spans": out}


def main():
    ex = DocumentExtractor(log_level=logging.CRITICAL)
    docs_dir = OUT / "docs"
    rec_dir = OUT / "golden" / "records"
    span_dir = OUT / "golden" / "spans"
    for d in (docs_dir, rec_dir, span_dir):
        d.mkdir(parents=True, exist_ok=True)

    records = []
    n_docs = 0
    for name, fn, count in ARCHETYPES:
        adir = docs_dir / name
        adir.mkdir(exist_ok=True)
        for i in range(count):
            doc_id, pages = fn(rng, n_docs)
            spans = make_spans(rng, doc_id, pages)
            doc = {"doc_id": doc_id, "spans": spans}
            (adir / f"{doc_id}.json").write_text(
                json.dumps(doc, ensure_ascii=False, indent=1), encoding="utf-8")

            gs = out_spans(ex, doc_id, spans)
            (span_dir / f"{doc_id}.json").write_text(
                json.dumps(gs, ensure_ascii=False, indent=1), encoding="utf-8")

            raw = full_text(spans)
            text = ex._clean_pdf_index_artifacts(raw) if raw else raw
            if text:
                rec = ex.extract_information(text, f"{doc_id}.pdf")
                if rec:
                    rec = {"doc_id": doc_id, **rec}
                    rec["file_path"] = f"{doc_id}.pdf"
                    rec["file_name"] = f"{doc_id}.pdf"
                    (rec_dir / f"{doc_id}.json").write_text(
                        json.dumps(rec, ensure_ascii=False, indent=1), encoding="utf-8")
                    records.append(rec)
            n_docs += 1

    # Completeness report golden (src/processor.py:181-259 semantics,
    # minus timestamps).
    total = len(records)
    language_stats, court_stats, case_type_stats = {}, {}, {}
    for r in records:
        lang = r.get("language", "unknown")
        language_stats[lang] = language_stats.get(lang, 0) + 1
        court = r.get("court_name", "unknown")
        if court and court != "unknown":
            key = court[:50] + "..." if len(court) > 50 else court
            court_stats[key] = court_stats.get(key, 0) + 1
        ct = r.get("case_type", "unknown")
        if ct and ct != "unknown":
            if "application" in ct.lower():
                case_type_stats["Application"] = case_type_stats.get("Application", 0) + 1
            elif "action" in ct.lower():
                case_type_stats["Action"] = case_type_stats.get("Action", 0) + 1
            else:
                case_type_stats["Other"] = case_type_stats.get("Other", 0) + 1
    all_fields = [k for k in records[0].keys() if k not in ("file_name", "file_path", "doc_id")]
    completeness = {}
    for f in all_fields:
        complete = sum(1 for r in records if str(r.get(f) or "").strip())
        completeness[f] = {"complete": complete, "missing": total - complete,
                           "percentage": complete / total * 100 if total else 0}
    report = {"total_files_processed": total,
              "language_distribution": language_stats,
              "court_distribution": court_stats,
              "case_type_distribution": case_type_stats,
              "field_completeness": completeness}
    (OUT / "golden" / "report.json").write_text(
        json.dumps(report, ensure_ascii=False, indent=1), encoding="utf-8")
    print(f"generated {n_docs} docs, {total} golden records")


if __name__ == "__main__":
    main()
