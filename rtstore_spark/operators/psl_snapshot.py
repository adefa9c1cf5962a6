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
- the largest geographic families ARE included: the 47 Japanese
  prefecture second-levels and the US state space (``<st>.us`` plus the
  ``k12.<st>.us`` school family); the finer city spaces (city .jp,
  voivodeship .pl, ...) remain omitted;
- the high-traffic PRIVATE-section suffixes crawls actually hit are
  included (github.io, blogspot.*, wordpress.com, the
  *.compute.amazonaws.com wildcards, netlify/vercel/pages.dev, ...) so
  domain caps group by site, not by hosting provider; the long tail of
  the private section is not — supply the full publicsuffix.org list
  via ``load_psl_rules(spark, path)`` when it matters;
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
// ---- Japan prefecture second-levels (the largest geographic family;
// ---- the finer city space below prefectures is still omitted)
hokkaido.jp
aomori.jp
iwate.jp
miyagi.jp
akita.jp
yamagata.jp
fukushima.jp
ibaraki.jp
tochigi.jp
gunma.jp
saitama.jp
chiba.jp
tokyo.jp
kanagawa.jp
niigata.jp
toyama.jp
ishikawa.jp
fukui.jp
yamanashi.jp
nagano.jp
gifu.jp
shizuoka.jp
aichi.jp
mie.jp
shiga.jp
kyoto.jp
osaka.jp
hyogo.jp
nara.jp
wakayama.jp
tottori.jp
shimane.jp
okayama.jp
hiroshima.jp
yamaguchi.jp
tokushima.jp
kagawa.jp
ehime.jp
kochi.jp
fukuoka.jp
saga.jp
nagasaki.jp
kumamoto.jp
oita.jp
miyazaki.jp
kagoshima.jp
okinawa.jp
// ---- United States state second-levels + the k12 school family
ak.us
al.us
ar.us
az.us
ca.us
co.us
ct.us
dc.us
de.us
fl.us
ga.us
hi.us
ia.us
id.us
il.us
in.us
ks.us
ky.us
la.us
ma.us
md.us
me.us
mi.us
mn.us
mo.us
ms.us
mt.us
nc.us
nd.us
ne.us
nh.us
nj.us
nm.us
nv.us
ny.us
oh.us
ok.us
or.us
pa.us
ri.us
sc.us
sd.us
tn.us
tx.us
ut.us
va.us
vt.us
wa.us
wi.us
wv.us
wy.us
k12.ak.us
k12.al.us
k12.ar.us
k12.az.us
k12.ca.us
k12.co.us
k12.ct.us
k12.dc.us
k12.de.us
k12.fl.us
k12.ga.us
k12.ia.us
k12.id.us
k12.il.us
k12.in.us
k12.ks.us
k12.ky.us
k12.la.us
k12.ma.us
k12.md.us
k12.me.us
k12.mi.us
k12.mn.us
k12.mo.us
k12.ms.us
k12.mt.us
k12.nc.us
k12.ne.us
k12.nh.us
k12.nj.us
k12.nm.us
k12.nv.us
k12.ny.us
k12.oh.us
k12.ok.us
k12.or.us
k12.pa.us
k12.ri.us
k12.sc.us
k12.tn.us
k12.tx.us
k12.ut.us
k12.va.us
k12.vt.us
k12.wa.us
k12.wi.us
k12.wy.us
// ===BEGIN PRIVATE DOMAINS===
// ---- private section: the hosting/CDN suffixes crawls actually hit.
// ---- Grouping by SITE (user subdomain), not by hosting provider, is
// ---- what domain caps / dedup-by-registrable-domain want here; the
// ---- canonical section marker above lets icann_only drop the block
// ---- for ownership analyses, same as on the full list.
github.io
githubusercontent.com
gitlab.io
blogspot.com
blogspot.co.uk
blogspot.co.nz
blogspot.com.au
blogspot.com.br
blogspot.com.ar
blogspot.ca
blogspot.de
blogspot.fr
blogspot.it
blogspot.es
blogspot.nl
blogspot.in
blogspot.jp
blogspot.kr
blogspot.mx
blogspot.ru
blogspot.se
blogspot.ch
blogspot.pt
wordpress.com
tumblr.com
weebly.com
wixsite.com
neocities.org
readthedocs.io
herokuapp.com
netlify.app
vercel.app
pages.dev
workers.dev
web.app
firebaseapp.com
appspot.com
azurewebsites.net
cloudfront.net
fly.dev
onrender.com
surge.sh
s3.amazonaws.com
*.compute.amazonaws.com
*.compute-1.amazonaws.com
elasticbeanstalk.com
// ===END PRIVATE DOMAINS===
"""


def builtin_psl_rules(spark, icann_only: bool = False):
    """The snapshot as a ``load_psl_rules``-shaped broadcast table.
    ``icann_only`` drops the snapshot's PRIVATE section (see
    ``web.load_psl_rules`` for when each grouping is right)."""
    from rtstore_spark.operators.web import parse_psl_text

    return parse_psl_text(spark, SNAPSHOT, icann_only=icann_only)
