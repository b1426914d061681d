a	▁a
about	▁about
abouted	▁about ed
abouter	▁about er
aboutest	▁about est
abouting	▁about ing
aboutly	▁about ly
abouts	▁about s
aed	▁a ed
aer	▁a er
aest	▁a est
after	▁after
aftered	▁af t ere d
afterer	▁af t ere r
afterest	▁af t ere st
aftering	▁after ing
afterly	▁after ly
afters	▁after s
aing	▁a ing
all	▁all
alled	▁all ed
aller	▁all er
allest	▁all est
alling	▁all ing
allly	▁all ly
alls	▁all s
also	▁also
alsoed	▁also ed
alsoer	▁also er
alsoest	▁also est
alsoing	▁also ing
alsoly	▁also ly
alsos	▁also s
aly	▁a ly
an	▁an
and	▁and
anded	▁and ed
ander	▁and er
andest	▁and est
anding	▁and ing
andly	▁and ly
ands	▁and s
aned	▁an ed
aner	▁an er
anest	▁an est
aning	▁an ing
anly	▁an ly
ans	▁an s
any	▁any
anyed	▁any ed
anyer	▁any er
anyest	▁any est
anying	▁any ing
anyly	▁any ly
anys	▁any s
are	▁are
ared	▁are d
arely	▁are ly
arer	▁are r
ares	▁are s
arest	▁are st
aring	▁a r ing
as	▁as
ased	▁as ed
aser	▁as er
ases	▁a ses
asest	▁as est
asing	▁as ing
asly	▁as ly
at	▁at
ated	▁at ed
ater	▁a ter
atest	▁at est
ating	▁at ing
atly	▁at ly
ats	▁at s
back	▁back
backed	▁back ed
backer	▁back er
backest	▁back est
backing	▁back ing
backly	▁back ly
backs	▁back s
be	▁be
because	▁because
becaused	▁becau s ed
becausely	▁because ly
becauser	▁becau s er
becauses	▁because s
becausest	▁becau s est
becausing	▁becau s ing
bed	▁b ed
been	▁been
beened	▁been ed
beener	▁been er
beenest	▁been est
beening	▁been ing
beenly	▁been ly
beens	▁been s
before	▁before
befored	▁before d
beforely	▁before ly
beforer	▁before r
befores	▁before s
beforest	▁before st
beforing	▁be f or ing
bely	▁be ly
ber	▁b er
bes	▁be s
best	▁b est
bing	▁b ing
but	▁but
buted	▁but ed
buter	▁b u ter
butest	▁but est
buting	▁but ing
butly	▁but ly
buts	▁but s
by	▁by
byed	▁by ed
byer	▁by er
byest	▁by est
bying	▁by ing
byly	▁by ly
bys	▁by s
can	▁can
caned	▁can ed
caner	▁can er
canest	▁can est
caning	▁can ing
canly	▁can ly
cans	▁can s
could	▁could
coulded	▁could ed
coulder	▁could er
couldest	▁could est
coulding	▁could ing
couldly	▁could ly
coulds	▁could s
did	▁did
dided	▁did ed
dider	▁did er
didest	▁did est
diding	▁did ing
didly	▁did ly
dids	▁did s
do	▁do
doed	▁do ed
doer	▁do er
doest	▁do est
doing	▁do ing
doly	▁do ly
dos	▁do s
down	▁down
downed	▁down ed
downer	▁down er
downest	▁down est
downing	▁down ing
downly	▁down ly
downs	▁down s
each	▁each
eached	▁each ed
eacher	▁each er
eachest	▁each est
eaching	▁each ing
eachly	▁each ly
eachs	▁each s
even	▁even
evened	▁even ed
evener	▁even er
evenest	▁even est
evening	▁even ing
evenly	▁even ly
evens	▁even s
first	▁first
firsted	▁first ed
firster	▁first er
firstest	▁first est
firsting	▁first ing
firstly	▁first ly
firsts	▁first s
for	▁for
fored	▁f ore d
forer	▁f ore r
forest	▁f ore st
foring	▁for ing
forly	▁for ly
fors	▁f o rs
from	▁from
fromed	▁from ed
fromer	▁from er
fromest	▁from est
froming	▁from ing
fromly	▁from ly
froms	▁from s
had	▁had
haded	▁had ed
hader	▁had er
hadest	▁had est
hading	▁had ing
hadly	▁had ly
hads	▁had s
has	▁has
hased	▁has ed
haser	▁has er
hases	▁ha ses
hasest	▁has est
hasing	▁has ing
hasly	▁has ly
have	▁have
haved	▁hav ed
havely	▁have ly
haver	▁hav er
haves	▁have s
havest	▁hav est
having	▁hav ing
he	▁he
hed	▁h ed
hely	▁he ly
her	▁her
hered	▁h ere d
herer	▁h ere r
herest	▁h ere st
hering	▁her ing
herly	▁her ly
hers	▁her s
hes	▁he s
hest	▁h est
him	▁him
himed	▁him ed
himer	▁him er
himest	▁him est
himing	▁him ing
himly	▁him ly
hims	▁him s
hing	▁h ing
his	▁his
hised	▁his ed
hiser	▁his er
hises	▁h i ses
hisest	▁his est
hising	▁his ing
hisly	▁his ly
i	▁i
ied	▁i ed
ier	▁i er
iest	▁i est
if	▁if
ifed	▁if ed
ifer	▁if er
ifest	▁if est
ifing	▁if ing
ifly	▁if ly
ifs	▁if s
iing	▁i ing
ily	▁i ly
in	▁in
ined	▁in ed
iner	▁in er
inest	▁in est
ining	▁in ing
inly	▁in ly
ins	▁in s
into	▁into
intoed	▁into ed
intoer	▁into er
intoest	▁into est
intoing	▁into ing
intoly	▁into ly
intos	▁into s
is	▁is
ised	▁is ed
iser	▁is er
ises	▁i ses
isest	▁is est
ising	▁is ing
isly	▁is ly
it	▁it
ited	▁it ed
iter	▁it er
itest	▁it est
iting	▁it ing
itly	▁it ly
its	▁its
itsed	▁its ed
itser	▁its er
itses	▁it ses
itsest	▁its est
itsing	▁its ing
itsly	▁its ly
just	▁just
justed	▁just ed
juster	▁just er
justest	▁just est
justing	▁just ing
justly	▁just ly
justs	▁just s
like	▁like
liked	▁lik ed
likely	▁like ly
liker	▁lik er
likes	▁like s
likest	▁lik est
liking	▁lik ing
made	▁made
maded	▁mad ed
madely	▁made ly
mader	▁mad er
mades	▁made s
madest	▁mad est
mading	▁mad ing
man	▁man
maned	▁man ed
maner	▁man er
manest	▁man est
maning	▁man ing
manly	▁man ly
mans	▁man s
many	▁many
manyed	▁many ed
manyer	▁many er
manyest	▁many est
manying	▁many ing
manyly	▁many ly
manys	▁many s
may	▁may
mayed	▁may ed
mayer	▁may er
mayest	▁may est
maying	▁may ing
mayly	▁may ly
mays	▁may s
me	▁me
med	▁m ed
mely	▁me ly
mer	▁m er
mes	▁me s
mest	▁m est
ming	▁m ing
more	▁more
mored	▁more d
morely	▁more ly
morer	▁more r
mores	▁more s
morest	▁more st
moring	▁m or ing
most	▁most
mosted	▁most ed
moster	▁most er
mostest	▁most est
mosting	▁most ing
mostly	▁most ly
mosts	▁most s
much	▁much
muched	▁much ed
mucher	▁much er
muchest	▁much est
muching	▁much ing
muchly	▁much ly
muchs	▁much s
must	▁must
musted	▁must ed
muster	▁must er
mustest	▁must est
musting	▁must ing
mustly	▁must ly
musts	▁must s
my	▁my
myed	▁my ed
myer	▁my er
myest	▁my est
mying	▁my ing
myly	▁my ly
mys	▁my s
new	▁new
newed	▁new ed
newer	▁new er
newest	▁new est
newing	▁new ing
newly	▁new ly
news	▁new s
no	▁no
noed	▁no ed
noer	▁no er
noest	▁no est
noing	▁no ing
noly	▁no ly
nos	▁no s
not	▁not
noted	▁not ed
noter	▁no ter
notest	▁not est
noting	▁not ing
notly	▁not ly
nots	▁not s
now	▁now
nowed	▁now ed
nower	▁now er
nowest	▁now est
nowing	▁now ing
nowly	▁now ly
nows	▁now s
of	▁of
ofed	▁of ed
ofer	▁of er
ofest	▁of est
ofing	▁of ing
ofly	▁of ly
ofs	▁of s
on	▁on
one	▁one
oned	▁on ed
onely	▁one ly
oner	▁on er
ones	▁one s
onest	▁on est
oning	▁on ing
only	▁only
onlyed	▁only ed
onlyer	▁only er
onlyest	▁only est
onlying	▁only ing
onlyly	▁only ly
onlys	▁only s
ons	▁on s
or	▁or
ored	▁o re d
orer	▁o re r
orest	▁o re st
oring	▁or ing
orly	▁or ly
ors	▁o rs
other	▁other
othered	▁o th ere d
otherer	▁o th ere r
otherest	▁o th ere st
othering	▁other ing
otherly	▁other ly
others	▁other s
our	▁our
oured	▁ou re d
ourer	▁ou re r
ourest	▁ou re st
ouring	▁our ing
ourly	▁our ly
ours	▁ou rs
out	▁out
outed	▁out ed
outer	▁out er
outest	▁out est
outing	▁out ing
outly	▁out ly
outs	▁out s
over	▁over
overed	▁ov ere d
overer	▁ov ere r
overest	▁ov ere st
overing	▁over ing
overly	▁over ly
overs	▁over s
people	▁people
peopled	▁peopl ed
peoplely	▁people ly
peopler	▁peopl er
peoples	▁people s
peoplest	▁peopl est
peopling	▁peopl ing
rea	▁rea
reabout	▁rea bout
reafter	▁rea f ter
reall	▁rea ll
realso	▁rea lso
rean	▁re an
reand	▁re an d
reany	▁re an y
reare	▁rea re
reas	▁re as
reat	▁re at
reback	▁re b ack
rebe	▁re be
rebecause	▁re be cau se
rebeen	▁re be en
rebefore	▁re be fore
rebut	▁re b ut
reby	▁re b y
recan	▁re c an
recould	▁re c ould
redid	▁re d id
redo	▁re d o
redown	▁re d o wn
reeach	▁re each
reeven	▁re even
refirst	▁re f irst
refor	▁re f or
refrom	▁re f rom
rehad	▁reh ad
rehas	▁reh as
rehave	▁reh a v e
rehe	▁reh e
reher	▁reh er
rehim	▁reh im
rehis	▁reh is
rei	▁re i
reif	▁re i f
rein	▁re in
reinto	▁re in to
reis	▁re is
reit	▁re i t
reits	▁re i t s
rejust	▁re just
relike	▁re lik e
remade	▁rem ad e
reman	▁rem an
remany	▁rem an y
remay	▁rem ay
reme	▁rem e
remore	▁rem ore
remost	▁rem ost
remuch	▁rem uch
remust	▁rem ust
remy	▁rem y
renew	▁re n ew
reno	▁re no
renot	▁re no t
renow	▁re no w
reof	▁reo f
reon	▁reo n
reone	▁reo n e
reonly	▁reo n ly
reor	▁re or
reother	▁reo ther
reour	▁re ou r
reout	▁re out
reover	▁reo v er
repeople	▁re peopl e
resaid	▁res aid
reshe	▁res h e
reshould	▁res h ould
reso	▁re so
resome	▁res om e
resuch	▁res uch
rethan	▁reth an
rethat	▁reth at
rethe	▁rethe
retheir	▁rethe ir
rethem	▁rethe m
rethen	▁reth en
rethere	▁reth ere
rethese	▁rethe se
rethey	▁rethe y
rethis	▁reth is
rethose	▁reth o se
rethrough	▁reth rough
retime	▁re t im e
reto	▁re to
retwo	▁re t wo
reup	▁re u p
rewas	▁rew as
reway	▁rew ay
rewe	▁rew e
rewell	▁rew e ll
rewere	▁rew ere
rewhat	▁rewh at
rewhen	▁rewh en
rewhere	▁rewh ere
rewhich	▁rewh ich
rewho	▁rewh o
rewill	▁rew i ll
rewith	▁rew i th
rewould	▁rew ould
reyears	▁re y ears
reyou	▁re y ou
reyour	▁re y ou r
said	▁said
saided	▁said ed
saider	▁said er
saidest	▁said est
saiding	▁said ing
saidly	▁said ly
saids	▁said s
she	▁she
shed	▁sh ed
shely	▁she ly
sher	▁sh er
shes	▁she s
shest	▁sh est
shing	▁sh ing
should	▁should
shoulded	▁should ed
shoulder	▁should er
shouldest	▁should est
shoulding	▁should ing
shouldly	▁should ly
shoulds	▁should s
so	▁so
soed	▁so ed
soer	▁so er
soest	▁so est
soing	▁so ing
soly	▁so ly
some	▁some
somed	▁som ed
somely	▁some ly
somer	▁som er
somes	▁some s
somest	▁som est
soming	▁som ing
sos	▁so s
such	▁such
suched	▁such ed
sucher	▁such er
suchest	▁such est
suching	▁such ing
suchly	▁such ly
suchs	▁such s
than	▁than
thaned	▁than ed
thaner	▁than er
thanest	▁than est
thaning	▁than ing
thanly	▁than ly
thans	▁than s
that	▁that
thated	▁that ed
thater	▁that er
thatest	▁that est
thating	▁that ing
thatly	▁that ly
thats	▁that s
the	▁the
thed	▁the d
their	▁their
theired	▁the i re d
theirer	▁the i re r
theirest	▁the i re st
theiring	▁their ing
theirly	▁their ly
theirs	▁their s
thely	▁the ly
them	▁them
themed	▁them ed
themer	▁them er
themest	▁them est
theming	▁them ing
themly	▁them ly
thems	▁them s
then	▁then
thened	▁then ed
thener	▁then er
thenest	▁then est
thening	▁then ing
thenly	▁then ly
thens	▁then s
ther	▁th er
there	▁there
thered	▁there d
therely	▁there ly
therer	▁there r
theres	▁there s
therest	▁there st
thering	▁th er ing
thes	▁thes
these	▁these
thesed	▁thes ed
thesely	▁these ly
theser	▁thes er
theses	▁these s
thesest	▁thes est
thesing	▁thes ing
thest	▁the st
they	▁they
theyed	▁they ed
theyer	▁they er
theyest	▁they est
theying	▁they ing
theyly	▁they ly
theys	▁they s
thing	▁th ing
this	▁this
thised	▁this ed
thiser	▁this er
thises	▁th i ses
thisest	▁this est
thising	▁this ing
thisly	▁this ly
those	▁those
thosed	▁tho s ed
thosely	▁those ly
thoser	▁tho s er
thoses	▁those s
thosest	▁tho s est
thosing	▁tho s ing
through	▁through
throughed	▁through ed
througher	▁through er
throughest	▁through est
throughing	▁through ing
throughly	▁through ly
throughs	▁through s
time	▁time
timed	▁tim ed
timely	▁time ly
timer	▁tim er
times	▁time s
timest	▁tim est
timing	▁tim ing
to	▁to
toed	▁to ed
toer	▁to er
toest	▁to est
toing	▁to ing
toly	▁to ly
tos	▁to s
two	▁two
twoed	▁two ed
twoer	▁two er
twoest	▁two est
twoing	▁two ing
twoly	▁two ly
twos	▁two s
una	▁una
unabout	▁una bout
unafter	▁una f ter
unall	▁una ll
unalso	▁una lso
unan	▁un an
unand	▁un an d
unany	▁un an y
unare	▁una re
unas	▁un as
unat	▁un at
unback	▁un b ack
unbe	▁un be
unbecause	▁un be cau se
unbeen	▁un be en
unbefore	▁un be fore
unbut	▁un b ut
unby	▁un b y
uncan	▁un c an
uncould	▁un c ould
undid	▁un d id
undo	▁un d o
undown	▁un d o wn
uneach	▁un each
uneven	▁un even
unfirst	▁un f irst
unfor	▁un f or
unfrom	▁un f rom
unhad	▁unh ad
unhas	▁unh as
unhave	▁unh a v e
unhe	▁unh e
unher	▁unh er
unhim	▁unh im
unhis	▁unh is
uni	▁un i
unif	▁un i f
unin	▁un in
uninto	▁un in to
unis	▁un is
unit	▁un i t
units	▁un i t s
unjust	▁un just
unlike	▁un lik e
unmade	▁unm ad e
unman	▁unm an
unmany	▁unm an y
unmay	▁unm ay
unme	▁unm e
unmore	▁unm ore
unmost	▁unm ost
unmuch	▁unm uch
unmust	▁unm ust
unmy	▁unm y
unnew	▁un n ew
unno	▁un no
unnot	▁un no t
unnow	▁un no w
unof	▁uno f
unon	▁uno n
unone	▁uno n e
unonly	▁uno n ly
unor	▁un or
unother	▁uno ther
unour	▁un ou r
unout	▁un out
unover	▁uno v er
unpeople	▁un peopl e
unsaid	▁un s aid
unshe	▁un s h e
unshould	▁un s h ould
unso	▁un so
unsome	▁un s om e
unsuch	▁un s uch
unthan	▁unth an
unthat	▁unth at
unthe	▁unthe
untheir	▁unthe ir
unthem	▁unthe m
unthen	▁unth en
unthere	▁unth ere
unthese	▁unthe se
unthey	▁unthe y
unthis	▁unth is
unthose	▁unth o se
unthrough	▁unth rough
untime	▁un t im e
unto	▁un to
untwo	▁un t wo
unup	▁un u p
unwas	▁unw as
unway	▁unw ay
unwe	▁unw e
unwell	▁unw e ll
unwere	▁unw ere
unwhat	▁unwh at
unwhen	▁unwh en
unwhere	▁unwh ere
unwhich	▁unwh ich
unwho	▁unwh o
unwill	▁unw i ll
unwith	▁unw i th
unwould	▁unw ould
unyears	▁un y ears
unyou	▁un y ou
unyour	▁un y ou r
up	▁up
uped	▁up ed
uper	▁up er
upest	▁up est
uping	▁up ing
uply	▁up ly
ups	▁up s
was	▁was
wased	▁was ed
waser	▁was er
wases	▁w a ses
wasest	▁was est
wasing	▁was ing
wasly	▁was ly
way	▁way
wayed	▁way ed
wayer	▁way er
wayest	▁way est
waying	▁way ing
wayly	▁way ly
ways	▁way s
we	▁we
wed	▁w ed
well	▁well
welled	▁well ed
weller	▁well er
wellest	▁well est
welling	▁well ing
wellly	▁well ly
wells	▁well s
wely	▁we ly
wer	▁w er
were	▁were
wered	▁were d
werely	▁were ly
werer	▁were r
weres	▁were s
werest	▁were st
wering	▁w er ing
wes	▁we s
west	▁w est
what	▁what
whated	▁what ed
whater	▁what er
whatest	▁what est
whating	▁what ing
whatly	▁what ly
whats	▁what s
when	▁when
whened	▁when ed
whener	▁when er
whenest	▁when est
whening	▁when ing
whenly	▁when ly
whens	▁when s
where	▁where
whered	▁where d
wherely	▁where ly
wherer	▁where r
wheres	▁where s
wherest	▁where st
whering	▁wh er ing
which	▁which
whiched	▁which ed
whicher	▁which er
whichest	▁which est
whiching	▁which ing
whichly	▁which ly
whichs	▁which s
who	▁who
whoed	▁who ed
whoer	▁who er
whoest	▁who est
whoing	▁who ing
wholy	▁who ly
whos	▁who s
will	▁will
willed	▁will ed
willer	▁will er
willest	▁will est
willing	▁will ing
willly	▁will ly
wills	▁will s
wing	▁w ing
with	▁with
withed	▁with ed
wither	▁wi ther
withest	▁with est
withing	▁with ing
withly	▁with ly
withs	▁with s
would	▁would
woulded	▁would ed
woulder	▁would er
wouldest	▁would est
woulding	▁would ing
wouldly	▁would ly
woulds	▁would s
years	▁years
yearsed	▁years ed
yearser	▁years er
yearses	▁y ea r ses
yearsest	▁years est
yearsing	▁years ing
yearsly	▁years ly
you	▁you
youed	▁you ed
youer	▁you er
youest	▁you est
youing	▁you ing
youly	▁you ly
your	▁your
youred	▁you re d
yourer	▁you re r
yourest	▁you re st
youring	▁your ing
yourly	▁your ly
yours	▁you rs
yous	▁you s
