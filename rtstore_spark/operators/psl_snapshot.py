"""Built-in public-suffix snapshot (curated subset, PSL file format).

The exact eTLD+1 algorithm (operators/web.py ``load_psl_rules`` /
``with_registrable_domain``) needs a rule file; deployments should
broadcast the full, current publicsuffix.org list (~9.5k rules, MPL
2.0). This module embeds a CURATED SUBSET in the same file format so
exact-algorithm matching is available with no external file: the stable,
well-known ICP country second-level registries plus the wildcard/
exception forms the algorithm must handle. Coverage notes:

- every unlisted TLD falls back to the PSL default rule (one label), so
  gTLDs (.com/.org/.io/...) need no entries;
- geographic second-levels (city .jp, voivodeship .pl, ...) and the
  private section (github.io, ...) are NOT included — supply the full
  list via ``load_psl_rules(spark, path)`` when those matter;
- the subset is a strict superset of the two-level heuristic
  ``web.url_domain`` uses, so switching to ``builtin_psl_rules`` never
  loses a grouping the heuristic had.
"""

from __future__ import annotations

# one rule per line, publicsuffix.org/list format (comments with //)
SNAPSHOT = """\
// curated subset of the public suffix list (ICP section); see module doc
// ---- United Kingdom
co.uk
org.uk
me.uk
ltd.uk
plc.uk
net.uk
sch.uk
ac.uk
gov.uk
nhs.uk
// ---- Australia
com.au
net.au
org.au
edu.au
gov.au
asn.au
id.au
// ---- Japan (organizational; city space omitted)
co.jp
or.jp
ne.jp
ac.jp
ad.jp
ed.jp
go.jp
gr.jp
lg.jp
// ---- Brazil
com.br
net.br
org.br
gov.br
edu.br
mil.br
art.br
eco.br
// ---- China (organizational + major regions)
com.cn
net.cn
org.cn
gov.cn
edu.cn
ac.cn
mil.cn
bj.cn
sh.cn
gd.cn
// ---- India
co.in
net.in
org.in
firm.in
gen.in
ind.in
ac.in
edu.in
gov.in
mil.in
res.in
// ---- South Korea
co.kr
ne.kr
or.kr
re.kr
pe.kr
go.kr
mil.kr
ac.kr
hs.kr
ms.kr
es.kr
sc.kr
kg.kr
// ---- New Zealand
co.nz
net.nz
org.nz
govt.nz
ac.nz
school.nz
geek.nz
gen.nz
maori.nz
iwi.nz
// ---- South Africa
co.za
net.za
org.za
gov.za
edu.za
ac.za
web.za
// ---- Mexico
com.mx
net.mx
org.mx
gob.mx
edu.mx
// ---- Turkey
com.tr
net.tr
org.tr
gov.tr
edu.tr
k12.tr
av.tr
bel.tr
pol.tr
mil.tr
web.tr
gen.tr
// ---- Argentina
com.ar
net.ar
org.ar
gob.ar
edu.ar
int.ar
mil.ar
tur.ar
// ---- Singapore
com.sg
net.sg
org.sg
gov.sg
edu.sg
per.sg
// ---- Hong Kong
com.hk
net.hk
org.hk
gov.hk
edu.hk
idv.hk
// ---- Taiwan
com.tw
net.tw
org.tw
gov.tw
edu.tw
mil.tw
idv.tw
game.tw
club.tw
ebiz.tw
// ---- Indonesia
co.id
net.id
or.id
web.id
sch.id
go.id
mil.id
ac.id
biz.id
my.id
// ---- Thailand
co.th
net.th
or.th
go.th
ac.th
in.th
mi.th
// ---- Malaysia
com.my
net.my
org.my
gov.my
edu.my
mil.my
name.my
// ---- Philippines
com.ph
net.ph
org.ph
gov.ph
edu.ph
ngo.ph
mil.ph
i.ph
// ---- Vietnam
com.vn
net.vn
org.vn
gov.vn
edu.vn
int.vn
ac.vn
biz.vn
info.vn
name.vn
pro.vn
health.vn
// ---- Israel
co.il
org.il
net.il
k12.il
gov.il
muni.il
ac.il
idf.il
// ---- Poland (functional; voivodeship space omitted)
com.pl
net.pl
org.pl
edu.pl
gov.pl
mil.pl
info.pl
biz.pl
waw.pl
// ---- Ukraine (functional; city space omitted)
com.ua
net.ua
org.ua
edu.ua
gov.ua
in.ua
// ---- Kenya
co.ke
or.ke
ne.ke
go.ke
ac.ke
sc.ke
me.ke
info.ke
mobi.ke
// ---- Nigeria
com.ng
net.ng
org.ng
gov.ng
edu.ng
sch.ng
name.ng
mobi.ng
// ---- Egypt
com.eg
net.eg
org.eg
gov.eg
edu.eg
sci.eg
eun.eg
mil.eg
name.eg
// ---- Saudi Arabia
com.sa
net.sa
org.sa
gov.sa
edu.sa
med.sa
pub.sa
sch.sa
// ---- United Arab Emirates
co.ae
net.ae
org.ae
gov.ae
ac.ae
sch.ae
mil.ae
// ---- Canada (provincial + federal)
ab.ca
bc.ca
mb.ca
nb.ca
nf.ca
nl.ca
ns.ca
nt.ca
nu.ca
on.ca
pe.ca
qc.ca
sk.ca
yk.ca
gc.ca
// ---- Russia (functional legacy)
com.ru
net.ru
org.ru
msk.ru
spb.ru
// ---- Colombia / Chile / Peru / Venezuela / Ecuador / Uruguay
com.co
net.co
org.co
edu.co
gov.co
mil.co
nom.co
gob.cl
gov.cl
mil.cl
com.pe
net.pe
org.pe
gob.pe
edu.pe
mil.pe
nom.pe
com.ve
net.ve
org.ve
gob.ve
edu.ve
mil.ve
com.ec
net.ec
org.ec
gov.ec
gob.ec
edu.ec
mil.ec
com.uy
net.uy
org.uy
gub.uy
edu.uy
mil.uy
// ---- Greece / Portugal-adjacent
com.gr
net.gr
org.gr
edu.gr
gov.gr
com.pt
net.pt
org.pt
edu.pt
gov.pt
int.pt
publ.pt
// ---- wildcard + exception forms (exercise the full algorithm)
*.ck
!www.ck
*.bd
*.kw
*.er
*.fk
"""


def builtin_psl_rules(spark):
    """The snapshot as a ``load_psl_rules``-shaped broadcast table."""
    from rtstore_spark.operators.web import parse_psl_text

    return parse_psl_text(spark, SNAPSHOT)
