"""Analysis chain — StandardAnalyzer-equivalent tokenization, vectorized.

Reference chain (lucene/core/src/java/org/apache/lucene/analysis/standard/
StandardAnalyzer.java:85-96): StandardTokenizer → LowerCaseFilter →
StopFilter, with:

* default stop set EMPTY (StandardAnalyzer.java:46-53);
* ``maxTokenLength`` default 255 — longer tokens are SKIPPED but still bump
  the next token's position increment (StandardTokenizer.java:145-168);
* StopFilter removal also bumps the next token's position increment
  (FilteringTokenFilter semantics, analysis/StopFilter.java:24-40);
* query-side ``Analyzer.normalize`` applies LowerCaseFilter only
  (StandardAnalyzer.java:98-101).

Tokenizer scope: the reference's UAX#29 JFlex grammar
(StandardTokenizerImpl.jflex) is approximated with a compiled regex that
matches it on the corpora this engine targets (see ``_TOKEN_RE`` docstring).
Divergences (full-width forms, complex-script segmentation) are documented,
not silently different: golden-token tests in tests/test_analysis.py pin the
behavior.

Everything here is a pure kernel: no Ray imports. The invert stage calls
``tokenize_batch`` once per Arrow batch — one megastring regex scan, no
per-row Python loop.

The ``simple`` analyzer (``[a-z0-9]+`` over lowercased text) is an exactly
SQL-expressible variant used by the DuckDB oracle queries; on the target
corpus (lowercase ASCII words) it produces identical output to ``standard``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

MAX_TOKEN_LENGTH_DEFAULT = 255  # StandardAnalyzer.java:37 DEFAULT_MAX_TOKEN_LENGTH

# EnglishAnalyzer's 33-word stop list (analysis/common/.../en/EnglishAnalyzer.java:43-52)
# — NOT applied by default (StandardAnalyzer default stop set is empty), exposed
# for the opt-in "english" chain.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

# snowball german_stop.txt / french_stop.txt, verbatim (the reference ships
# these resources; de/GermanAnalyzer.java:53, fr/FrenchAnalyzer.java:53 —
# note the French list intentionally omits été/est/fût homonyms).
GERMAN_STOP_WORDS = frozenset(
    """aber alle allem allen aller alles als also am an ander andere anderem
    anderen anderer anderes anderm andern anderr anders auch auf aus bei bin
    bis bist da damit dann der den des dem die das daß derselbe derselben
    denselben desselben demselben dieselbe dieselben dasselbe dazu dein deine
    deinem deinen deiner deines denn derer dessen dich dir du dies diese
    diesem diesen dieser dieses doch dort durch ein eine einem einen einer
    eines einig einige einigem einigen einiger einiges einmal er ihn ihm es
    etwas euer eure eurem euren eurer eures für gegen gewesen hab habe haben
    hat hatte hatten hier hin hinter ich mich mir ihr ihre ihrem ihren ihrer
    ihres euch im in indem ins ist jede jedem jeden jeder jedes jene jenem
    jenen jener jenes jetzt kann kein keine keinem keinen keiner keines
    können könnte machen man manche manchem manchen mancher manches mein
    meine meinem meinen meiner meines mit muss musste nach nicht nichts noch
    nun nur ob oder ohne sehr sein seine seinem seinen seiner seines selbst
    sich sie ihnen sind so solche solchem solchen solcher solches soll sollte
    sondern sonst über um und uns unse unsem unsen unser unses unter viel vom
    von vor während war waren warst was weg weil weiter welche welchem
    welchen welcher welches wenn werde werden wie wieder will wir wird wirst
    wo wollen wollte würde würden zu zum zur zwar zwischen""".split()
)

FRENCH_STOP_WORDS = frozenset(
    """au aux avec ce ces dans de des du elle en et eux il je la le leur lui
    ma mais me même mes moi mon ne nos notre nous on ou par pas pour qu que
    qui sa se ses sur ta te tes toi ton tu un une vos votre vous c d j l à m
    n s t y étée étées étant suis es êtes sont serai seras sera serons serez
    seront serais serait serions seriez seraient étais était étions étiez
    étaient fus fut fûmes fûtes furent sois soit soyons soyez soient fusse
    fusses fussions fussiez fussent ayant eu eue eues eus ai avons avez ont
    aurai aurons aurez auront aurais aurait aurions auriez
    auraient avais avait aviez avaient eut eûmes eûtes eurent aie
    aies ait ayons ayez aient eusse eusses eût eussions eussiez eussent ceci
    cela celà cet cette ici ils les leurs quel quels quelle quelles sans
    soi""".split()
)

# snowball spanish_stop.txt / italian_stop.txt / portuguese_stop.txt,
# verbatim (es/SpanishAnalyzer.java:46, it/ItalianAnalyzer.java:47,
# pt/PortugueseAnalyzer.java:45 load these resources).
SPANISH_STOP_WORDS = frozenset(
    """de la que el en y a los del se las por un para con no una su al lo
    como más pero sus le ya o este sí porque esta entre cuando muy sin
    sobre también me hasta hay donde quien desde todo nos durante todos
    uno les ni contra otros ese eso ante ellos e esto mí antes algunos qué
    unos yo otro otras otra él tanto esa estos mucho quienes nada muchos
    cual poco ella estar estas algunas algo nosotros mi mis tú te ti tu
    tus ellas nosotras vosotros vosotras os mío mía míos mías tuyo tuya
    tuyos tuyas suyo suya suyos suyas nuestro nuestra nuestros nuestras
    vuestro vuestra vuestros vuestras esos esas estoy estás está estamos
    estáis están esté estés estemos estéis estén estaré estarás estará
    estaremos estaréis estarán estaría estarías estaríamos estaríais
    estarían estaba estabas estábamos estabais estaban estuve estuviste
    estuvo estuvimos estuvisteis estuvieron estuviera estuvieras
    estuviéramos estuvierais estuvieran estuviese estuvieses estuviésemos
    estuvieseis estuviesen estando estado estada estados estadas estad he
    has ha hemos habéis han haya hayas hayamos hayáis hayan habré habrás
    habrá habremos habréis habrán habría habrías habríamos habríais
    habrían había habías habíamos habíais habían hube hubiste hubo hubimos
    hubisteis hubieron hubiera hubieras hubiéramos hubierais hubieran
    hubiese hubieses hubiésemos hubieseis hubiesen habiendo habido habida
    habidos habidas soy eres es somos sois son sea seas seamos seáis sean
    seré serás será seremos seréis serán sería serías seríamos seríais
    serían era eras éramos erais eran fui fuiste fue fuimos fuisteis
    fueron fuera fueras fuéramos fuerais fueran fuese fueses fuésemos
    fueseis fuesen siendo sido tengo tienes tiene tenemos tenéis tienen
    tenga tengas tengamos tengáis tengan tendré tendrás tendrá tendremos
    tendréis tendrán tendría tendrías tendríamos tendríais tendrían tenía
    tenías teníamos teníais tenían tuve tuviste tuvo tuvimos tuvisteis
    tuvieron tuviera tuvieras tuviéramos tuvierais tuvieran tuviese
    tuvieses tuviésemos tuvieseis tuviesen teniendo tenido tenida tenidos
    tenidas tened""".split()
)

ITALIAN_STOP_WORDS = frozenset(
    """ad al allo ai agli all agl alla alle con col coi da dal dallo dai
    dagli dall dagl dalla dalle di del dello dei degli dell degl della
    delle in nel nello nei negli nell negl nella nelle su sul sullo sui
    sugli sull sugl sulla sulle per tra contro io tu lui lei noi voi loro
    mio mia miei mie tuo tua tuoi tue suo sua suoi sue nostro nostra
    nostri nostre vostro vostra vostri vostre mi ti ci vi lo la li le gli
    ne il un uno una ma ed se perché anche come dov dove che chi cui non
    più quale quanto quanti quanta quante quello quelli quella quelle
    questo questi questa queste si tutto tutti a c e i l o ho hai ha
    abbiamo avete hanno abbia abbiate abbiano avrò avrai avrà avremo
    avrete avranno avrei avresti avrebbe avremmo avreste avrebbero avevo
    avevi aveva avevamo avevate avevano ebbi avesti ebbe avemmo aveste
    ebbero avessi avesse avessimo avessero avendo avuto avuta avuti avute
    sono sei è siamo siete sia siate siano sarò sarai sarà saremo sarete
    saranno sarei saresti sarebbe saremmo sareste sarebbero ero eri era
    eravamo eravate erano fui fosti fu fummo foste furono fossi fosse
    fossimo fossero essendo faccio fai facciamo fanno faccia facciate
    facciano farò farai farà faremo farete faranno farei faresti farebbe
    faremmo fareste farebbero facevo facevi faceva facevamo facevate
    facevano feci facesti fece facemmo faceste fecero facessi facesse
    facessimo facessero facendo sto stai sta stiamo stanno stia stiate
    stiano starò starai starà staremo starete staranno starei staresti
    starebbe staremmo stareste starebbero stavo stavi stava stavamo
    stavate stavano stetti stesti stette stemmo steste stettero stessi
    stesse stessimo stessero stando""".split()
)

PORTUGUESE_STOP_WORDS = frozenset(
    """de a o que e do da em um para com não uma os no se na por mais as dos
    como mas ao ele das à seu sua ou quando muito nos já eu também só pelo
    pela até isso ela entre depois sem mesmo aos seus quem nas me esse
    eles você essa num nem suas meu às minha numa pelos elas qual nós lhe
    deles essas esses pelas este dele tu te vocês vos lhes meus minhas teu
    tua teus tuas nosso nossa nossos nossas dela delas esta estes estas
    aquele aquela aqueles aquelas isto aquilo estou está estamos estão
    estive esteve estivemos estiveram estava estávamos estavam estivera
    estivéramos esteja estejamos estejam estivesse estivéssemos estivessem
    estiver estivermos estiverem hei há havemos hão houve houvemos
    houveram houvera houvéramos haja hajamos hajam houvesse houvéssemos
    houvessem houver houvermos houverem houverei houverá houveremos
    houverão houveria houveríamos houveriam sou somos são era éramos eram
    fui foi fomos foram fora fôramos seja sejamos sejam fosse fôssemos
    fossem for formos forem serei será seremos serão seria seríamos seriam
    tenho tem temos tém tinha tínhamos tinham tive teve tivemos tiveram
    tivera tivéramos tenha tenhamos tenham tivesse tivéssemos tivessem
    tiver tivermos tiverem terei terá teremos terão teria teríamos teriam""".split()
)

# snowball russian/swedish/finnish/hungarian stop lists, verbatim
# (multi-word lines split like WordlistLoader.getSnowballWordSet; the
# *_light analyzer kinds pair them with the Savoy light stemmers).
RUSSIAN_STOP_WORDS = frozenset(
    """и в во не что он на я с со как а то все она так его но да ты к у же вы
    за бы по только ее мне было вот от меня еще нет о из ему теперь когда
    даже ну вдруг ли если уже или ни быть был него до вас нибудь опять уж
    вам сказал ведь там потом себя ничего ей может они тут где есть надо
    ней для мы тебя их чем была сам чтоб без будто человек чего раз тоже
    себе под жизнь будет ж тогда кто этот говорил того потому этого какой
    совсем ним здесь этом один почти мой тем чтобы нее кажется сейчас были
    куда зачем сказать всех никогда сегодня можно при наконец два об
    другой хоть после над больше тот через эти нас про всего них какая
    много разве сказала три эту моя впрочем хорошо свою этой перед иногда
    лучше чуть том нельзя такой им более всегда конечно всю между""".split()
)

SWEDISH_STOP_WORDS = frozenset(
    """och det att i en jag hon som han på den med var sig för så till är men
    ett om hade de av icke mig du henne då sin nu har inte hans honom
    skulle hennes där min man ej vid kunde något från ut när efter upp vi
    dem vara vad över än dig kan sina här ha mot alla under någon eller
    allt mycket sedan ju denna själv detta åt utan varit hur ingen mitt ni
    bli blev oss din dessa några deras blir mina samma vilken er sådan vår
    blivit dess inom mellan sådant varför varje vilka ditt vem vilket
    sitta sådana vart dina vars vårt våra ert era vilkas""".split()
)

FINNISH_STOP_WORDS = frozenset(
    """olla olen olet on olemme olette ovat ole oli olisi olisit olisin
    olisimme olisitte olisivat olit olin olimme olitte olivat ollut olleet
    en et ei emme ette eivät minä minun minut minua minussa minusta minuun
    minulla minulta minulle sinä sinun sinut sinua sinussa sinusta sinuun
    sinulla sinulta sinulle hän hänen hänet häntä hänessä hänestä häneen
    hänellä häneltä hänelle me meidän meidät meitä meissä meistä meihin
    meillä meiltä meille te teidän teidät teitä teissä teistä teihin
    teillä teiltä teille he heidän heidät heitä heissä heistä heihin
    heillä heiltä heille tämä tämän tätä tässä tästä tähän tällä tältä
    tälle tänä täksi tuo tuon tuota tuossa tuosta tuohon tuolla tuolta
    tuolle tuona tuoksi se sen sitä siinä siitä siihen sillä siltä sille
    siksi nämä näiden näitä näissä näistä näihin näillä näiltä näille
    näinä näiksi nuo noiden noita noissa noista noihin noilla noilta
    noille noina noiksi ne niiden niitä niissä niistä niihin niillä niiltä
    niille niinä niiksi kuka kenen kenet ketä kenessä kenestä keneen
    kenellä keneltä kenelle kenenä keneksi ketkä keiden keitä keissä
    keistä keihin keillä keiltä keille keinä keiksi mikä minkä mitä missä
    mistä mihin millä miltä mille miksi mitkä joka jonka jota jossa josta
    johon jolla jolta jolle jona joksi jotka joiden joita joissa joista
    joihin joilla joilta joille joina joiksi että ja jos koska kuin mutta
    niin sekä tai vaan vai vaikka kanssa mukaan noin poikki yli kun nyt
    itse""".split()
)

HUNGARIAN_STOP_WORDS = frozenset(
    """a ahogy ahol aki akik akkor alatt által általában amely amelyek
    amelyekben amelyeket amelyet amelynek ami amit amolyan amíg amikor át
    abban ahhoz annak arra arról az azok azon azt azzal azért aztán azután
    azonban bár be belül benne cikk cikkek cikkeket csak de e eddig egész
    egy egyes egyetlen egyéb egyik egyre ekkor el elég ellen elő először
    előtt első én éppen ebben ehhez emilyen ennek erre ez ezt ezek ezen
    ezzel ezért és fel felé hanem hiszen hogy hogyan igen így illetve ill.
    ill ilyen ilyenkor ison ismét itt jó jól jobban kell kellett keresztül
    keressünk ki kívül között közül legalább lehet lehetett legyen lenne
    lenni lesz lett maga magát majd már más másik meg még mellett mert
    mely melyek mi mit míg miért milyen mikor minden mindent mindenki
    mindig mint mintha mivel most nagy nagyobb nagyon ne néha nekem neki
    nem néhány nélkül nincs olyan ott össze ő ők őket pedig persze rá s
    saját sem semmi sok sokat sokkal számára szemben szerint szinte talán
    tehát teljes tovább továbbá több úgy ugyanis új újabb újra után utána
    utolsó vagy vagyis valaki valami valamint való vagyok van vannak volt
    voltam voltak voltunk vissza vele viszont volna""".split()
)

# Savoy Arabic stopword list, verbatim and UN-normalized — the reference
# applies StopFilter BEFORE ArabicNormalizationFilter for exactly this
# reason (ar/ArabicAnalyzer.java:127 "the stopword list is not
# normalized!"); the normalize+stem step here also runs after stop.
ARABIC_STOP_WORDS = frozenset(
    """من ومن منها منه في وفي فيها فيه و ف ثم او أو ب بها به ا أ اى اي أي أى
    لا ولا الا ألا إلا لكن ما وما كما فما عن مع اذا إذا ان أن إن انها أنها
    إنها انه أنه إنه بان بأن فان فأن وان وأن وإن التى التي الذى الذي الذين
    الى الي إلى إلي على عليها عليه اما أما إما ايضا أيضا كل وكل لم ولم لن
    ولن هى هي هو وهى وهي وهو فهى فهي فهو انت أنت لك لها له هذه هذا تلك ذلك
    هناك كانت كان يكون تكون وكانت وكان غير بعض قد نحو بين بينما منذ ضمن
    حيث الان الآن خلال بعد قبل حتى عند عندما لدى جميع""".split()
)

# fa/stopwords.txt (NORMALIZED — the reference applies StopFilter after
# both normalizers, fa/PersianAnalyzer.java:114) and ckb/stopwords.txt.
PERSIAN_STOP_WORDS = frozenset(
    """انان نداشته سراسر خياه ايشان وي تاكنون بيشتري دوم پس ناشي وگو يا
    داشتند سپس هنگام هرگز پنج نشان امسال ديگر گروهي شدند چطور ده و دو
    نخستين ولي چرا چه وسط ه كدام قابل يك رفت هفت همچنين در هزار بله بلي
    شايد اما شناسي گرفته دهد داشته دانست داشتن خواهيم ميليارد وقتيكه امد
    خواهد جز اورده شده بلكه خدمات شدن برخي نبود بسياري جلوگيري حق كردند
    نوعي بعري نكرده نظير نبايد بوده بودن داد اورد هست جايي شود دنبال داده
    بايد سابق هيچ همان انجا كمتر كجاست گردد كسي تر مردم تان دادن بودند سري
    جدا ندارند مگر يكديگر دارد دهند بنابراين هنگامي سمت جا انچه خود دادند
    زياد دارند اثر بدون بهترين بيشتر البته به براساس بيرون كرد بعضي گرفت
    توي اي ميليون او جريان تول بر مانند برابر باشيم مدتي گويند اكنون تا
    تنها جديد چند بي نشده كردن كردم گويد كرده كنيم نمي نزد روي قصد فقط
    بالاي ديگران اين ديروز توسط سوم ايم دانند سوي استفاده شما كنار داريم
    ساخته طور امده رفته نخست بيست نزديك طي كنيد از انها تمامي داشت يكي
    طريق اش چيست روب نمايد گفت چندين چيزي تواند ام ايا با ان ايد ترين
    اينكه ديگري راه هايي بروز همچنان پاعين كس حدود مختلف مقابل چيز گيرد
    ندارد ضد همچون سازي شان مورد باره مرسي خويش برخوردار چون خارج شش هنوز
    تحت ضمن هستيم گفته فكر بسيار پيش براي روزهاي انكه نخواهد بالا كل وقتي
    كي چنين كه گيري نيست است كجا كند نيز يابد بندي حتي توانند عقب خواست
    كنند بين تمام همه ما باشند مثل شد اري باشد اره طبق بعد اگر صورت غير
    جاي بيش ريزي اند زيرا چگونه بار لطفا مي درباره من ديده همين گذاري
    برداري علت گذاشته هم فوق نه ها شوند اباد همواره هر اول خواهند چهار نام
    امروز مان هاي قبل كنم سعي تازه را هستند زير جلوي عنوان بود""".split()
)

SORANI_STOP_WORDS = frozenset(
    """و کە ی کرد ئەوەی سەر دوو هەروەها لەو دەکات چەند هەر ئەو ئەم من ئێمە تۆ
    ئێوە ئەوان بە پێ بەبێ بەدەم بەلای بەپێی بەرلە بەرەوی بەرەوە بەردەم بێ
    بێجگە بۆ دە تێ دەگەڵ دوای جگە لە لێ لەبەر لەبەینی لەبابەت لەبارەی
    لەباتی لەبن لەبرێتی لەدەم لەگەڵ لەلایەن لەناو لەنێو لەپێناوی لەرەوی
    لەرێ لەرێگا لەسەر لەژێر ناو نێوان پاش پێش وەک""".split()
)

# hi/stopwords.txt verbatim (applied AFTER normalization,
# hi/HindiAnalyzer.java:121).
HINDI_STOP_WORDS = frozenset(
    """अंदर अत अपना अपनी अपने अभी आदि आप इत्यादि इन इनका इन्हीं इन्हें इन्हों
    इस इसका इसकी इसके इसमें इसी इसे उन उनका उनकी उनके उनको उन्हीं उन्हें
    उन्हों उस उसके उसी उसे एक एवं एस ऐसे और कई कर करता करते करना करने करें
    कहते कहा का काफ़ी कि कितना किन्हें किन्हों किया किर किस किसी किसे की
    कुछ कुल के को कोई कौन कौनसा गया घर जब जहाँ जा जितना जिन जिन्हें
    जिन्हों जिस जिसे जीधर जैसा जैसे जो तक तब तरह तिन तिन्हें तिन्हों तिस
    तिसे तो था थी थे दबारा दिया दुसरा दूसरे दो द्वारा न नहीं ना निहायत
    नीचे ने पर पहले पूरा पे फिर बनी बही बहुत बाद बाला बिलकुल भी भीतर मगर
    मानो मे में यदि यह यहाँ यही या यिह ये रखें रहा रहे ऱ्वासा लिए लिये
    लेकिन व वर्ग वह वहाँ वहीं वाले वुह वे वग़ैरह संग सकता सकते सबसे सभी साथ
    साबुत साभ सारा से सो ही हुआ हुई हुए है हैं हो होता होती होते होना होने
    अपनि जेसे होति सभि तिंहों इंहों दवारा इसि किंहें थि उंहों ओर जिंहें
    वहिं अभि बनि हि उंहिं उंहें हें वगेरह एसे रवासा कोन निचे काफि उसि पुरा
    भितर हे बहि वहां कोइ यहां जिंहों तिंहें किसि कइ यहि इंहिं जिधर इंहें
    अदि इतयादि हुइ कोनसा इसकि दुसरे जहां अप किंहों उनकि भि वरग हुअ जेसा
    नहिं""".split()
)

# bg/stopwords.txt and id/stopwords.txt verbatim.
BULGARIAN_STOP_WORDS = frozenset(
    """а аз ако ала бе без беше би бил била били било близо бъдат бъде бяха в
    вас ваш ваша вероятно вече взема ви вие винаги все всеки всички всичко
    всяка във въпреки върху г ги главно го д да дали до докато докога дори
    досега доста е едва един ето за зад заедно заради засега затова защо
    защото и из или им има имат иска й каза как каква какво както какъв
    като кога когато което които кой който колко която къде където към ли
    м ме между мен ми мнозина мога могат може моля момента му н на над
    назад най направи напред например нас не него нея ни ние никой нито но
    някои някой няма обаче около освен особено от отгоре отново още пак по
    повече повечето под поне поради после почти прави пред преди през при
    пък първо с са само се сега си скоро след сме според сред срещу сте
    съм със също т тази така такива такъв там твой те тези ти тн то това
    тогава този той толкова точно трябва тук тъй тя тях у харесва ч че
    често чрез ще щом я""".split()
)

INDONESIAN_STOP_WORDS = frozenset(
    """ada adanya adalah adapun agak agaknya agar akan akankah akhirnya aku
    akulah amat amatlah anda andalah antar diantaranya antara antaranya
    diantara apa apaan mengapa apabila apakah apalagi apatah atau ataukah
    ataupun bagai bagaikan sebagai sebagainya bagaimana bagaimanapun
    sebagaimana bagaimanakah bagi bahkan bahwa bahwasanya sebaliknya
    banyak sebanyak beberapa seberapa begini beginian beginikah beginilah
    sebegini begitu begitukah begitulah begitupun sebegitu belum belumlah
    sebelum sebelumnya sebenarnya berapa berapakah berapalah berapapun
    betulkah sebetulnya biasa biasanya bila bilakah bisa bisakah sebisanya
    boleh bolehkah bolehlah buat bukan bukankah bukanlah bukannya cuma
    percuma dahulu dalam dan dapat dari daripada dekat demi demikian
    demikianlah sedemikian dengan depan di dia dialah dini diri dirinya
    terdiri dong dulu enggak enggaknya entah entahlah terhadap terhadapnya
    hal hampir hanya hanyalah harus haruslah harusnya seharusnya hendak
    hendaklah hendaknya hingga sehingga ia ialah ibarat ingin inginkah
    inginkan ini inikah inilah itu itukah itulah jangan jangankan
    janganlah jika jikalau juga justru kala kalau kalaulah kalaupun kalian
    kami kamilah kamu kamulah kan kapan kapankah kapanpun dikarenakan
    karena karenanya ke kecil kemudian kenapa kepada kepadanya ketika
    seketika khususnya kini kinilah kiranya sekiranya kita kitalah kok
    lagi lagian selagi lah lain lainnya melainkan selaku lalu melalui
    terlalu lama lamanya selama selamanya lebih terlebih bermacam macam
    semacam maka makanya makin malah malahan mampu mampukah mana manakala
    manalagi masih masihkah semasih masing mau maupun semaunya memang
    mereka merekalah meski meskipun semula mungkin mungkinkah nah namun
    nanti nantinya nyaris oleh olehnya seorang seseorang pada padanya
    padahal paling sepanjang pantas sepantasnya sepantasnyalah para pasti
    pastilah per pernah pula pun merupakan rupanya serupa saat saatnya
    sesaat saja sajalah saling bersama sama sesama sambil sampai sana
    sangat sangatlah saya sayalah se sebab sebabnya sebuah tersebut
    tersebutlah sedang sedangkan sedikit sedikitnya segala segalanya
    segera sesegera sejak sejenak sekali sekalian sekalipun sesekali
    sekaligus sekarang sekitar sekitarnya sela selain selalu seluruh
    seluruhnya semakin sementara sempat semua semuanya sendiri sendirinya
    seolah seperti sepertinya sering seringnya serta siapa siapakah
    siapapun disini disinilah sini sinilah sesuatu sesuatunya suatu
    sesudah sesudahnya sudah sudahkah sudahlah supaya tadi tadinya tak
    tanpa setelah telah tentang tentu tentulah tentunya tertentu
    seterusnya tapi tetapi setiap tiap setidaknya tidak tidakkah tidaklah
    toh waduh wah wahai sewaktu walau walaupun wong yaitu yakni yang""".split()
)

# cz/stopwords.txt and snowball norwegian_stop.txt verbatim.
CZECH_STOP_WORDS = frozenset(
    """a s k o i u v z dnes cz tímto budeš budem byli jseš můj svým ta tomto
    tohle tuto tyto jej zda proč máte tato kam tohoto kdo kteří mi nám tom
    tomuto mít nic proto kterou byla toho protože asi ho naši napište re
    což tím takže svých její svými jste aj tu tedy teto bylo kde ke pravé
    ji nad nejsou či pod téma mezi přes ty pak vám ani když však neg jsem
    tento článku články aby jsme před pta jejich byl ještě až bez také
    pouze první vaše která nás nový tipy pokud může strana jeho své jiné
    zprávy nové není vás jen podle zde už být více bude již než který by
    které co nebo ten tak má při od po jsou jak další ale si se ve to jako
    za zpět ze do pro je na atd atp jakmile přičemž já on ona ono oni ony
    my vy jí mě mne jemu tomu těm těmu němu němuž jehož jíž jelikož jež
    jakož načež""".split()
)

NORWEGIAN_STOP_WORDS = frozenset(
    """og i jeg det at en et den til er som på de med han av ikke ikkje der
    så var meg seg men ett har om vi min mitt ha hadde hun nå over da ved
    fra du ut sin dem oss opp man kan hans hvor eller hva skal selv sjøl
    her alle vil bli ble blei blitt kunne inn når være kom noen noe ville
    dere deres kun ja etter ned skulle denne for deg si sine sitt mot å
    meget hvorfor dette disse uten hvordan ingen din ditt blir samme
    hvilken hvilke sånn inni mellom vår hver hvem vors hvis både bare enn
    fordi før mange også slik vært båe begge siden dykk dykkar dei deira
    deires deim di då eg ein eit eitt elles honom hjå ho hoe henne hennar
    hennes hoss hossen ingi inkje korleis korso kva kvar kvarhelst kven
    kvi kvifor me medan mi mine mykje no nokon noka nokor noko nokre sia
    sidan so somt somme um upp vere vore verte vort varte vart""".split()
)

# lv/stopwords.txt and bn/stopwords.txt verbatim.
LATVIAN_STOP_WORDS = frozenset(
    """aiz ap ar apakš ārpus augšpus bez caur dēļ gar iekš iz kopš labad
    lejpus līdz no otrpus pa par pār pēc pie pirms pret priekš starp
    šaipus uz viņpus virs virspus zem apakšpus un bet jo ja ka lai tomēr
    tikko turpretī arī kaut gan tādēļ tā ne tikvien vien kā ir te vai
    kamēr diezin droši diemžēl nebūt ik it taču nu pat tiklab iekšpus nedz
    tik nevis turpretim jeb iekam iekām iekāms kolīdz līdzko tiklīdz jebšu
    tālab tāpēc nekā itin jā jau jel nē nezin tad tikai vis tak iekams būt
    biju biji bija bijām bijāt esmu esi esam esat būšu būsi būs būsim
    būsiet tikt tiku tiki tika tikām tikāt tieku tiec tiek tiekam tiekat
    tikšu tiks tiksim tiksiet tapt tapi tapāt topat tapšu tapsi taps
    tapsim tapsiet kļūt kļuvu kļuvi kļuva kļuvām kļuvāt kļūstu kļūsti
    kļūst kļūstam kļūstat kļūšu kļūsi kļūs kļūsim kļūsiet varēt varēju
    varējām varēšu varēsim var varēji varējāt varēsi varēsiet varat varēja
    varēs""".split()
)

BENGALI_STOP_WORDS = frozenset(
    """এই ও থেকে করে এ না ওই এক্ নিয়ে করা বলেন সঙ্গে যে এব তা আর কোনো বলে সেই
    দিন হয় কি দু পরে সব দেওয়া মধ্যে এর সি শুরু কাজ কিছু কাছে সে তবে বা বন
    আগে জ্নজন পি পর তো ছিল এখন আমরা প্রায় দুই আমাদের তাই অন্য গিয়ে প্রযন্ত
    মনে নতুন মতো কেখা প্রথম আজ টি ধামার অনেক বিভিন্ন র হাজার জানা নয় অবশ্য
    বেশি এস কে হতে বি কয়েক সহ বেশ এমন এমনি কেন কেউ নেওয়া চেষ্টা লক্ষ বলা
    কারণ আছে শুধু তখন যা এসে চার যদি আবার কোটি উত্তর সামনে উপর বক্তব্য এত
    প্রাথমিক উপরে প্রতি কাজে যখন খুব বহু গেল পেয়্র্ চালু ই নাগাদ থাকা পাচ
    যাওয়া রকম সাধারণ কমনে""".split()
)

# el/stopwords.txt verbatim (already in GreekLowerCase-folded form —
# the reference applies StopFilter after GreekLowerCaseFilter).
GREEK_STOP_WORDS = frozenset(
    """ο η το οι τα του τησ των τον την και κι κ ειμαι εισαι ειναι ειμαστε
    ειστε στο στον στη στην μα αλλα απο για προσ με σε ωσ παρα αντι κατα
    μετα θα να δε δεν μη μην επι ενω εαν αν τοτε που πωσ ποιοσ ποια ποιο
    ποιοι ποιεσ ποιων ποιουσ αυτοσ αυτη αυτο αυτοι αυτων αυτουσ αυτεσ αυτα
    εκεινοσ εκεινη εκεινο εκεινοι εκεινεσ εκεινα εκεινων εκεινουσ οπωσ
    ομωσ ισωσ οσο οτι""".split()
)

# UAX#29-approximating word pattern, mirroring the JFlex WORD rule structure
# (StandardTokenizerImpl.jflex:240-255):
#   letter-runs joined by MidLetter∪MidNumLet∪SingleQuote ≈ [.:'’·],
#   digit-runs joined by MidNum∪MidNumLet∪SingleQuote ≈ [.,;'’],
#   letter/digit segments concatenate (WB9/WB10), '_' (ExtendNumLet) joins
#   segments (WB13a/b), katakana runs stay together (WB13), CJK ideographs
#   and hiragana are single-codepoint tokens (IDEOGRAPHIC/HIRAGANA types).
# Known divergences vs the full grammar (documented, golden-tested): emoji
# sequences, Hebrew-quote rules, mixed katakana+latin adjacency.
# Emoji sequences (faces, tone-modified hands, ZWJ families) are emitted
# as single tokens, matching the grammar's EMOJI type
# (StandardTokenizerImpl.jflex, Unicode-9 word-break + emoji rules);
# regional-indicator flags / keycaps remain documented divergences.
_EMOJI_BASE = "[\U0001F000-\U0001FAFF\u2600-\u27BF\u2B00-\u2BFF\u2764\u2B50]"
_EMOJI_MOD = "[\U0001F3FB-\U0001F3FF\uFE0F]"
_EMOJI_SEG = f"{_EMOJI_BASE}{_EMOJI_MOD}*(?:\u200D{_EMOJI_BASE}{_EMOJI_MOD}*)*"
_IDEO_HIRA = "⺀-⻿぀-ゟ㐀-䶿一-鿿豈-﫿"
_KATA = "ァ-ヺー-ヿㇰ-ㇿｦ-ﾟ"  # incl. half-width forms (KATAKANA type)
_L = rf"[^\W\d_{_IDEO_HIRA}{_KATA}]"  # unicode letter, CJK handled separately
# Hebrew-quote word-break rules (WB7a/b/c of the UAX#29 grammar the
# reference compiles): gershayim/double-quote BETWEEN Hebrew letters
# joins (צה״ל stays one token); a single quote/geresh AFTER a Hebrew
# letter is kept (WB7a).
_HEB = "\u05D0-\u05EA"
# Hebrew marks (niqqud/cantillation, NOT the punctuation scattered in
# the block): a mark rides its letter, so lookbehinds that anchor on a
# Hebrew letter must also accept a mark (UAX#29 WB4 transparency)
_HEBM = rf"{_HEB}\u0591-\u05BD\u05BF\u05C1\u05C2\u05C4\u05C5\u05C7"
_LJOIN = rf"(?:[.:\u0027\u2019\u00B7]|(?<=[{_HEBM}])[\"\u05F4](?=[{_HEB}]))"
# All BMP combining marks (Mn/Mc/Me) — UAX#29 WB4: Extend characters
# never break a word (they ride the preceding letter: Devanagari
# matras and virama, Hebrew niqqud, Thai tone marks, Arabic harakat).
# Generated from unicodedata (the bundled Unicode version) with:
#   [cp for cp in range(0x300,0x10000)
#    if unicodedata.category(chr(cp)).startswith("M")]
# collapsed to ranges — a literal so Ray workers skip the 64k
# category() calls at import.
_MARKS = (
    "[\u0300-\u036F\u0483-\u0489\u0591-\u05BD\u05BF\u05C1-\u05C2\u05C4-"
    "\u05C5\u05C7\u0610-\u061A\u064B-\u065F\u0670\u06D6-\u06DC\u06DF-"
    "\u06E4\u06E7-\u06E8\u06EA-\u06ED\u0711\u0730-\u074A\u07A6-"
    "\u07B0\u07EB-\u07F3\u07FD\u0816-\u0819\u081B-\u0823\u0825-"
    "\u0827\u0829-\u082D\u0859-\u085B\u0898-\u089F\u08CA-\u08E1\u08E3-"
    "\u0903\u093A-\u093C\u093E-\u094F\u0951-\u0957\u0962-\u0963\u0981-"
    "\u0983\u09BC\u09BE-\u09C4\u09C7-\u09C8\u09CB-\u09CD\u09D7\u09E2-"
    "\u09E3\u09FE\u0A01-\u0A03\u0A3C\u0A3E-\u0A42\u0A47-\u0A48\u0A4B-"
    "\u0A4D\u0A51\u0A70-\u0A71\u0A75\u0A81-\u0A83\u0ABC\u0ABE-\u0AC5\u0AC7-"
    "\u0AC9\u0ACB-\u0ACD\u0AE2-\u0AE3\u0AFA-\u0AFF\u0B01-"
    "\u0B03\u0B3C\u0B3E-\u0B44\u0B47-\u0B48\u0B4B-\u0B4D\u0B55-"
    "\u0B57\u0B62-\u0B63\u0B82\u0BBE-\u0BC2\u0BC6-\u0BC8\u0BCA-"
    "\u0BCD\u0BD7\u0C00-\u0C04\u0C3C\u0C3E-\u0C44\u0C46-\u0C48\u0C4A-"
    "\u0C4D\u0C55-\u0C56\u0C62-\u0C63\u0C81-\u0C83\u0CBC\u0CBE-"
    "\u0CC4\u0CC6-\u0CC8\u0CCA-\u0CCD\u0CD5-\u0CD6\u0CE2-\u0CE3\u0D00-"
    "\u0D03\u0D3B-\u0D3C\u0D3E-\u0D44\u0D46-\u0D48\u0D4A-"
    "\u0D4D\u0D57\u0D62-\u0D63\u0D81-\u0D83\u0DCA\u0DCF-\u0DD4\u0DD6\u0DD8-"
    "\u0DDF\u0DF2-\u0DF3\u0E31\u0E34-\u0E3A\u0E47-\u0E4E\u0EB1\u0EB4-"
    "\u0EBC\u0EC8-\u0ECD\u0F18-\u0F19\u0F35\u0F37\u0F39\u0F3E-\u0F3F\u0F71-"
    "\u0F84\u0F86-\u0F87\u0F8D-\u0F97\u0F99-\u0FBC\u0FC6\u102B-"
    "\u103E\u1056-\u1059\u105E-\u1060\u1062-\u1064\u1067-\u106D\u1071-"
    "\u1074\u1082-\u108D\u108F\u109A-\u109D\u135D-\u135F\u1712-"
    "\u1715\u1732-\u1734\u1752-\u1753\u1772-\u1773\u17B4-"
    "\u17D3\u17DD\u180B-\u180D\u180F\u1885-\u1886\u18A9\u1920-\u192B\u1930-"
    "\u193B\u1A17-\u1A1B\u1A55-\u1A5E\u1A60-\u1A7C\u1A7F\u1AB0-"
    "\u1ACE\u1B00-\u1B04\u1B34-\u1B44\u1B6B-\u1B73\u1B80-\u1B82\u1BA1-"
    "\u1BAD\u1BE6-\u1BF3\u1C24-\u1C37\u1CD0-\u1CD2\u1CD4-"
    "\u1CE8\u1CED\u1CF4\u1CF7-\u1CF9\u1DC0-\u1DFF\u20D0-\u20F0\u2CEF-"
    "\u2CF1\u2D7F\u2DE0-\u2DFF\u302A-\u302F\u3099-\u309A\uA66F-"
    "\uA672\uA674-\uA67D\uA69E-\uA69F\uA6F0-\uA6F1\uA802\uA806\uA80B\uA823-"
    "\uA827\uA82C\uA880-\uA881\uA8B4-\uA8C5\uA8E0-\uA8F1\uA8FF\uA926-"
    "\uA92D\uA947-\uA953\uA980-\uA983\uA9B3-\uA9C0\uA9E5\uAA29-"
    "\uAA36\uAA43\uAA4C-\uAA4D\uAA7B-\uAA7D\uAAB0\uAAB2-\uAAB4\uAAB7-"
    "\uAAB8\uAABE-\uAABF\uAAC1\uAAEB-\uAAEF\uAAF5-\uAAF6\uABE3-"
    "\uABEA\uABEC-\uABED\uFB1E\uFE00-\uFE0F\uFE20-\uFE2F]"
)
_LX = rf"(?:{_L}{_MARKS}*)"
_LSEG = rf"{_LX}+(?:{_LJOIN}{_LX}+)*(?:(?<=[{_HEBM}])[\u0027\u05F3])?"
_DX = rf"(?:\d{_MARKS}*)"  # digits extend with marks too (WB4)
_DSEG = rf"{_DX}+(?:[.,;'\u2019]{_DX}+)*"
_TOKEN_RE = re.compile(
    rf"{_EMOJI_SEG}"
    rf"|[{_KATA}]+"
    rf"|[{_IDEO_HIRA}]"
    rf"|_*(?:{_LSEG}|{_DSEG})(?:_*(?:{_LSEG}|{_DSEG}))*_*",
    re.UNICODE,
)

_SIMPLE_RE = re.compile(r"[a-z0-9]+")

# CJK bigram chain (CJKAnalyzer = StandardTokenizer + CJKBigramFilter,
# analysis/common/.../cjk/CJKAnalyzer.java + CJKBigramFilter.java): han +
# hiragana runs are kept whole at tokenize time, then expanded into
# overlapping character BIGRAMS (a lone char stays a unigram); katakana
# runs and latin/digit segments pass through the standard rules unchanged.
_CJK_TOKEN_RE = re.compile(
    rf"{_EMOJI_SEG}"
    rf"|[{_KATA}]+"
    rf"|[{_IDEO_HIRA}]+"
    rf"|_*(?:{_LSEG}|{_DSEG})(?:_*(?:{_LSEG}|{_DSEG}))*_*",
    re.UNICODE,
)
_CJK_RUN_RE = re.compile(rf"^[{_IDEO_HIRA}]+$")


def _cjk_expand(tokens: list[str]) -> list[str]:
    out: list[str] = []
    for t in tokens:
        if len(t) > 1 and _CJK_RUN_RE.match(t):
            out.extend(t[i : i + 2] for i in range(len(t) - 1))
        else:
            out.append(t)
    return out

def _fold_digits(w: str) -> str:
    """DecimalDigitFilter (core/.../analysis/core/DecimalDigitFilter.java):
    any Unicode decimal digit folds to its 0-9 equivalent."""
    if w.isascii():
        return w
    import unicodedata

    return "".join(
        chr(ord("0") + unicodedata.decimal(c))
        if unicodedata.category(c) == "Nd" and not c.isascii() else c
        for c in w)


# Language kinds that tokenize with the StandardTokenizer and run all
# their extra filters (stop/elision/normalize/stem) at VOCAB level — which
# makes the ASCII-simple Arrow fast path equally exact for them. A new
# language kind MUST be added here (and to _PRE_STOP_NORM_KINDS if it
# normalizes before the stop filter); _stem_fn refuses kinds in this set
# without a registered stemmer, so a missed registration fails loudly
# instead of silently Porter-stemming.
_STANDARD_LANG_KINDS = frozenset({
    "english", "german", "french", "spanish", "italian", "portuguese",
    "russian_light", "swedish_light", "finnish_light", "hungarian_light",
    "arabic", "persian", "sorani", "hindi", "bulgarian", "indonesian",
    "czech", "norwegian_light", "latvian", "bengali", "greek",
    "german_minimal", "french_minimal", "english_minimal",
    "russian", "swedish", "finnish", "hungarian", "english_snowball",
})
# kinds whose normalizers run BEFORE the stop filter (stopwords match the
# normalized forms) — these merge vocab entries, so they also force the
# post-transform re-intern
_PRE_STOP_NORM_KINDS = frozenset(
    {"persian", "sorani", "hindi", "bengali", "greek"})

_SEP = "\x00"  # never inside a token


@dataclass
class Analyzer:
    """A configured analysis chain. ``kind`` ∈ {standard, simple, english,
    whitespace}.

    ``english`` reproduces the reference EnglishAnalyzer chain
    (analysis/common/.../en/EnglishAnalyzer.java:97-108): StandardTokenizer →
    EnglishPossessiveFilter → LowerCaseFilter → StopFilter(33 words) →
    PorterStemFilter. Possessive strip / stemming run at VOCAB level (terms
    are dictionary-encoded first), then codes are re-interned.

    ``ascii_folding`` adds an ASCIIFoldingFilter-style accent fold (NFKD)
    before stopword filtering on any chain."""

    kind: str = "standard"
    max_token_length: int = MAX_TOKEN_LENGTH_DEFAULT
    stop_words: frozenset = field(default_factory=frozenset)
    stem: bool = False
    possessive: bool = False
    ascii_folding: bool = False
    elision: bool = False
    # SetKeywordMarkerFilter (miscellaneous/SetKeywordMarkerFilter.java):
    # terms in this set are protected from stemming
    stem_exclusions: frozenset = field(default_factory=frozenset)
    # ICUNormalizer2Filter analogue (analysis/icu/.../ICUNormalizer2Filter
    # .java:47, default nfkc_cf): NFKC + case fold + default-ignorable
    # removal, applied at vocab level before the stop filter (ICU chains
    # normalize first so stopwords match folded forms)
    icu_normalize: bool = False
    # CharFilters (pre-tokenizer character transforms with offset
    # correction, analysis/common/.../charfilter/): a tuple of JSON-able
    # specs — {"type": "html_strip"|"mapping"|"pattern_replace", ...} —
    # that ride the index manifest so searchers rebuild the same chain.
    char_filters: tuple = ()
    # WordDelimiterGraphFilter (miscellaneous/WordDelimiterGraphFilter
    # .java): flags bitmask (True = the Solr factory defaults). Only valid
    # with kind="whitespace" — the reference chains WDGF after a
    # WhitespaceTokenizer; the index chain here is whitespace → WDGF →
    # LowerCase (the canonical Solr fieldType order).
    word_delimiter: int = 0
    protected_words: frozenset = field(default_factory=frozenset)
    # DecimalDigitFilter (core/.../analysis/core/DecimalDigitFilter.java):
    # fold any Unicode decimal digit to its 0-9 equivalent (runs before the
    # stop filter, like the reference chains that use it)
    decimal_digit: bool = False
    # LengthFilter (miscellaneous/LengthFilter.java): drop tokens SHORTER
    # than this (max length is the existing max_token_length); removed
    # tokens bump the next position like any FilteringTokenFilter
    min_token_length: int = 0
    # KeepWordFilter (miscellaneous/KeepWordFilter.java): when non-empty,
    # drop every token NOT in the set
    keep_words: frozenset = field(default_factory=frozenset)
    # DictionaryCompoundWordTokenFilter (analysis/common/.../compound/
    # DictionaryCompoundWordTokenFilter.java + CompoundWordTokenFilterBase
    # .java:100-125): tokens >= compound_min_word chars are scanned for
    # dictionary subwords (every [i, i+j) window, j in [min_sub, max_sub]),
    # which are emitted at the SAME position as the kept original (posInc
    # 0). Runs LAST in the chain at vocab level. Stacked subwords do not
    # count toward field length (discountOverlaps).
    compound_dictionary: frozenset = field(default_factory=frozenset)
    compound_min_word: int = 5
    compound_min_sub: int = 2
    compound_max_sub: int = 15
    compound_only_longest: bool = False
    # PhoneticFilter (analysis/phonetic/PhoneticFilter.java): encode each
    # token with a phonetic encoder ("soundex" | "refined_soundex");
    # inject=True emits the encoding at the SAME position as the kept
    # original (posInc 0, encoded first — the reference's emission order),
    # inject=False replaces the token. Runs last, at vocab level.
    # "soundex" | "refined_soundex" | "metaphone" (classic, commons-codec
    # language/Metaphone) | "double_metaphone" (emits primary + alternate
    # codes, DoubleMetaphoneFilter semantics; phonetic_max_code_len = the
    # filter's maxCodeLength, default 4 — also caps classic metaphone)
    phonetic: str = ""
    phonetic_inject: bool = True
    phonetic_max_code_len: int = 4
    # JapaneseTokenizer user dictionary — userdict.txt lines (JSON-able so
    # the spec rides the index manifest); only used by kind="japanese"
    japanese_user_dict: tuple = ()
    # KoreanTokenizer (nori) user dictionary — nori userdict lines
    # ("세종" or "세종시 세종 시"); only used by kind="korean"
    korean_user_dict: tuple = ()
    # KoreanTokenizer.DecompoundMode: "discard" (reference default) |
    # "none" | "mixed"
    korean_decompound: str = "discard"
    # DelimitedPayloadTokenFilter (analysis/common/.../payloads/
    # DelimitedPayloadTokenFilter.java:26-60 + FloatEncoder): characters
    # before the FIRST delimiter are the token, after it the float payload.
    # Only valid with kind="whitespace" (the reference notes the tokenizer
    # must not split on the delimiter); the index chain lowercases the term
    # part after splitting.
    payload_delimiter: str = ""

    def __post_init__(self):
        if self.char_filters and not isinstance(self.char_filters, tuple):
            self.char_filters = tuple(self.char_filters)
        if self.compound_dictionary:
            self.compound_dictionary = frozenset(
                t.lower() for t in self.compound_dictionary)
        if self.word_delimiter:
            if self.word_delimiter is True:
                from lucene_ray.functions.worddelimiter import DEFAULT_FLAGS

                self.word_delimiter = DEFAULT_FLAGS
            if self.kind != "whitespace":
                raise ValueError(
                    "word_delimiter requires kind='whitespace' (the "
                    "reference chains WDGF after WhitespaceTokenizer)")
        if self.payload_delimiter:
            if self.kind != "whitespace":
                raise ValueError(
                    "payload_delimiter requires kind='whitespace' (the "
                    "tokenizer must not split on the delimiter)")
            if self.word_delimiter:
                raise ValueError(
                    "payload_delimiter and word_delimiter cannot combine")
        if self.kind == "keyword":
            # KeywordAnalyzer (core/.../analysis/core/KeywordAnalyzer.java):
            # the whole input is ONE token, any length, no case folding —
            # lift the 255-char default cap unless the caller set one
            if self.max_token_length == MAX_TOKEN_LENGTH_DEFAULT:
                self.max_token_length = 0
        if self.kind == "english":
            self.stop_words = self.stop_words or ENGLISH_STOP_WORDS
            self.stem = True
            self.possessive = True
        elif self.kind == "german":
            # de/GermanAnalyzer.java:120-128: StandardTokenizer → LowerCase →
            # Stop(german) → GermanNormalization → GermanLightStem
            self.stop_words = self.stop_words or GERMAN_STOP_WORDS
            self.stem = True
        elif self.kind == "french":
            # fr/FrenchAnalyzer.java:128-136: StandardTokenizer → Elision →
            # LowerCase → Stop(french) → FrenchLightStem (elision after
            # lowercasing here — equivalent: the reference's article set is
            # matched case-insensitively)
            self.stop_words = self.stop_words or FRENCH_STOP_WORDS
            self.stem = True
            self.elision = True
        elif self.kind == "spanish":
            # es/SpanishAnalyzer.java:113-120: StandardTokenizer → LowerCase
            # → Stop(spanish) → SpanishLightStem
            self.stop_words = self.stop_words or SPANISH_STOP_WORDS
            self.stem = True
        elif self.kind == "italian":
            # it/ItalianAnalyzer.java:122-130: StandardTokenizer →
            # Elision(italian articles) → LowerCase → Stop(italian) →
            # ItalianLightStem
            self.stop_words = self.stop_words or ITALIAN_STOP_WORDS
            self.stem = True
            self.elision = True
        elif self.kind == "portuguese":
            # pt/PortugueseAnalyzer.java:112-119: StandardTokenizer →
            # LowerCase → Stop(portuguese) → PortugueseLightStem
            self.stop_words = self.stop_words or PORTUGUESE_STOP_WORDS
            self.stem = True
        elif self.kind == "arabic":
            # ar/ArabicAnalyzer.java:123-135: StandardTokenizer → LowerCase →
            # DecimalDigitFilter → Stop(UN-normalized Savoy list) →
            # ArabicNormalization → ArabicStem. Normalization runs inside the
            # stem step here — after stop, like the reference (the one
            # divergence: stem_exclusions skip normalization too).
            self.stop_words = self.stop_words or ARABIC_STOP_WORDS
            self.stem = True
            self.decimal_digit = True
        elif self.kind == "persian":
            # fa/PersianAnalyzer.java:106-118: PersianCharFilter (ZWNJ →
            # space) → StandardTokenizer → LowerCase → DecimalDigit →
            # ArabicNormalization → PersianNormalization → Stop(NORMALIZED
            # list). No stemmer; both normalizers run BEFORE stop (the
            # pre-stop hook below).
            self.stop_words = self.stop_words or PERSIAN_STOP_WORDS
            self.decimal_digit = True
            if not self.char_filters:
                self.char_filters = (
                    {"type": "mapping", "rules": {"‌": " "}},)
        elif self.kind == "sorani":
            # ckb/SoraniAnalyzer.java:112-121: StandardTokenizer →
            # SoraniNormalization → LowerCase → DecimalDigit → Stop →
            # SoraniStem. Normalization runs at vocab level before stop
            # (order vs lowercase is immaterial: it only touches caseless
            # Arabic-script chars and format controls).
            self.stop_words = self.stop_words or SORANI_STOP_WORDS
            self.stem = True
            self.decimal_digit = True
        elif self.kind == "hindi":
            # hi/HindiAnalyzer.java:114-124: StandardTokenizer → LowerCase →
            # DecimalDigit → (keyword marker BEFORE normalization) →
            # IndicNormalization → HindiNormalization → Stop(normalized
            # list) → HindiStem. Normalization runs in the pre-stop hook,
            # skipping stem_exclusions like the reference's marker order.
            self.stop_words = self.stop_words or HINDI_STOP_WORDS
            self.stem = True
            self.decimal_digit = True
        elif self.kind == "bulgarian":
            # bg/BulgarianAnalyzer.java: StandardTokenizer → LowerCase →
            # Stop → BulgarianStem (BulStem light)
            self.stop_words = self.stop_words or BULGARIAN_STOP_WORDS
            self.stem = True
        elif self.kind == "indonesian":
            # id/IndonesianAnalyzer.java: StandardTokenizer → LowerCase →
            # Stop → IndonesianStem (derivational stemming on)
            self.stop_words = self.stop_words or INDONESIAN_STOP_WORDS
            self.stem = True
        elif self.kind == "latvian":
            # lv/LatvianAnalyzer.java: StandardTokenizer → LowerCase →
            # Stop → LatvianStem
            self.stop_words = self.stop_words or LATVIAN_STOP_WORDS
            self.stem = True
        elif self.kind == "bengali":
            # bn/BengaliAnalyzer.java:112-123: same shape as hindi — keyword
            # marker BEFORE normalization, IndicNormalization (Bengali
            # rules) → BengaliNormalization → Stop → BengaliStem
            self.stop_words = self.stop_words or BENGALI_STOP_WORDS
            self.stem = True
            self.decimal_digit = True
        elif self.kind in ("german_minimal", "french_minimal",
                           "english_minimal"):
            # the *MinimalStemFilter variants (conservative plural-only
            # stemming; de/GermanMinimalStemmer.java:57,
            # fr/FrenchMinimalStemmer.java:56, en/EnglishMinimalStemmer
            # .java:26 — Harman's S-stemmer); stopset + (for french)
            # elision match the full chains
            defaults_min = {"german_minimal": GERMAN_STOP_WORDS,
                            "french_minimal": FRENCH_STOP_WORDS,
                            "english_minimal": ENGLISH_STOP_WORDS}
            self.stop_words = self.stop_words or defaults_min[self.kind]
            self.stem = True
            if self.kind == "french_minimal":
                self.elision = True
        elif self.kind == "greek":
            # el/GreekAnalyzer.java:94-100: StandardTokenizer →
            # GreekLowerCase (final sigma + diacritic fold, runs pre-stop:
            # the stop list is in folded form) → Stop → GreekStem
            self.stop_words = self.stop_words or GREEK_STOP_WORDS
            self.stem = True
        elif self.kind == "czech":
            # cz/CzechAnalyzer.java: StandardTokenizer → LowerCase → Stop →
            # CzechStem (Dolamic-Savoy light)
            self.stop_words = self.stop_words or CZECH_STOP_WORDS
            self.stem = True
        elif self.kind == "norwegian_light":
            # the NorwegianLightStemFilter chain (Bokmål factory default);
            # the default NorwegianAnalyzer stems with snowball instead —
            # documented divergence, same policy as the other *_light kinds
            self.stop_words = self.stop_words or NORWEGIAN_STOP_WORDS
            self.stem = True
        elif self.kind in ("russian_light", "swedish_light", "finnish_light",
                           "hungarian_light"):
            # the *LightStemFilter chains (ru/RussianLightStemFilter.java
            # etc.): StandardTokenizer → LowerCase → Stop(snowball list) →
            # light stem. NOTE: the reference's default {Russian,Swedish,
            # Finnish,Hungarian}Analyzer uses the SNOWBALL stemmer instead;
            # these kinds are the light variants (Solr text_*_light) —
            # documented divergence, stemmers verified against the full
            # published vocabularies.
            defaults = {"russian_light": RUSSIAN_STOP_WORDS,
                        "swedish_light": SWEDISH_STOP_WORDS,
                        "finnish_light": FINNISH_STOP_WORDS,
                        "hungarian_light": HUNGARIAN_STOP_WORDS}
            self.stop_words = self.stop_words or defaults[self.kind]
            self.stem = True
        elif self.kind == "japanese":
            # ja/JapaneseAnalyzer.java: JapaneseTokenizer(user dict,
            # SEARCH) → BaseForm/PartOfSpeechStop (skipped: the reduced
            # public dictionary carries no POS/base-form data — documented
            # divergence) → CJKWidthFilter → Stop(ja stopwords) →
            # JapaneseKatakanaStemFilter → LowerCase. Width fold +
            # katakana stem run at vocab level via _stem_fn.
            from lucene_ray.functions.kuromoji import JAPANESE_STOP_WORDS

            self.stop_words = self.stop_words or JAPANESE_STOP_WORDS
            self.stem = True
            if self.japanese_user_dict and not isinstance(
                    self.japanese_user_dict, tuple):
                self.japanese_user_dict = tuple(self.japanese_user_dict)
        elif self.kind == "korean":
            # ko/KoreanAnalyzer.java:77-82: KoreanTokenizer(user dict,
            # DISCARD) → KoreanPartOfSpeechStopFilter(default tags) →
            # KoreanReadingFormFilter (no-op here: Hanja readings need the
            # full mecab-ko-dic — documented divergence) → LowerCaseFilter.
            # POS filtering replaces stopwords (nori has no stopword list).
            if self.korean_user_dict and not isinstance(
                    self.korean_user_dict, tuple):
                self.korean_user_dict = tuple(self.korean_user_dict)
        elif self.kind == "smart_chinese":
            # cn/smart/SmartChineseAnalyzer.java:123-134:
            # HMMChineseTokenizer → PorterStemFilter (Latin tokens) →
            # StopFilter(punctuation list — the lite tokenizer already
            # discards punctuation, the equivalent end state)
            self.stem = True
        elif self.kind == "thai":
            # th/ThaiAnalyzer.java:93-100: ThaiTokenizer → LowerCaseFilter
            # → DecimalDigitFilter → StopFilter(th stopwords)
            from lucene_ray.functions.thai import THAI_STOP_WORDS

            self.stop_words = self.stop_words or THAI_STOP_WORDS
            self.decimal_digit = True
        elif self.kind in ("russian", "swedish", "finnish", "hungarian"):
            # the reference's DEFAULT analyzers for these languages
            # (ru/RussianAnalyzer.java:141, sv/SwedishAnalyzer.java,
            # fi/FinnishAnalyzer.java, hu/HungarianAnalyzer.java):
            # StandardTokenizer → LowerCase → Stop(snowball list) →
            # SnowballFilter(tartarus {Russian,Swedish,Finnish,Hungarian}
            # Stemmer); stemmers verified against the full published
            # snowball vocabulary zips (2000 pairs each).
            defaults = {"russian": RUSSIAN_STOP_WORDS,
                        "swedish": SWEDISH_STOP_WORDS,
                        "finnish": FINNISH_STOP_WORDS,
                        "hungarian": HUNGARIAN_STOP_WORDS}
            self.stop_words = self.stop_words or defaults[self.kind]
            self.stem = True
        elif self.kind == "english_snowball":
            # EnglishAnalyzer variant with SnowballFilter(EnglishStemmer)
            # (Porter2) in place of PorterStemFilter — the snowball
            # "english"/porter2 option of SnowballPorterFilterFactory
            self.stop_words = self.stop_words or ENGLISH_STOP_WORDS
            self.stem = True
            self.possessive = True

    def _char_filter_chain(self):
        """Compiled CharFilter pipeline, built once per analyzer instance
        (each filter is one compiled combined regex)."""
        chain = getattr(self, "_cf_chain", None)
        if chain is None and self.char_filters:
            from lucene_ray.functions.charfilters import build_char_filter

            chain = tuple(build_char_filter(s) for s in self.char_filters)
            object.__setattr__(self, "_cf_chain", chain)
        return chain or ()

    def _japanese_tokenizer(self):
        """Viterbi segmenter, built once per analyzer instance (the user
        dictionary parse + lexicon scan live in __init__-equivalent time,
        the per-batch cost is the lattice walk only)."""
        jt = getattr(self, "_ja_tok", None)
        if jt is None:
            from lucene_ray.functions.kuromoji import JapaneseTokenizer

            jt = JapaneseTokenizer(user_dict=list(self.japanese_user_dict))
            object.__setattr__(self, "_ja_tok", jt)
        return jt

    def _korean_tokenizer(self):
        """nori-lite Viterbi segmenter, built once per analyzer instance."""
        kt = getattr(self, "_ko_tok", None)
        if kt is None:
            from lucene_ray.functions.korean import KoreanTokenizer

            kt = KoreanTokenizer(user_dict=list(self.korean_user_dict),
                                 decompound_mode=self.korean_decompound)
            object.__setattr__(self, "_ko_tok", kt)
        return kt

    def _chinese_tokenizer(self):
        """smartcn-lite Viterbi segmenter, built once per analyzer
        instance."""
        ct = getattr(self, "_zh_tok", None)
        if ct is None:
            from lucene_ray.functions.smartcn import ChineseTokenizer

            ct = ChineseTokenizer()
            object.__setattr__(self, "_zh_tok", ct)
        return ct

    def _thai_tokenizer(self):
        """thai-lite lattice segmenter, built once per analyzer instance."""
        tt = getattr(self, "_th_tok", None)
        if tt is None:
            from lucene_ray.functions.thai import ThaiTokenizer

            tt = ThaiTokenizer()
            object.__setattr__(self, "_th_tok", tt)
        return tt

    def _stem_fn(self):
        """Per-chain stemmer: Porter for english/+stem, the UniNE light
        stemmers (with their language normalization step) for german/french."""
        if self.kind == "german":
            from lucene_ray.functions.stemming import (german_light_stem,
                                                       german_normalize)

            return lambda t: german_light_stem(german_normalize(t))
        if self.kind == "french":
            from lucene_ray.functions.stemming import french_light_stem

            return french_light_stem
        if self.kind == "spanish":
            from lucene_ray.functions.stemming import spanish_light_stem

            return spanish_light_stem
        if self.kind == "italian":
            from lucene_ray.functions.stemming import italian_light_stem

            return italian_light_stem
        if self.kind == "portuguese":
            from lucene_ray.functions.stemming import portuguese_light_stem

            return portuguese_light_stem
        if self.kind in ("russian_light", "swedish_light", "finnish_light",
                         "hungarian_light"):
            from lucene_ray.functions import stemming as _st

            return {"russian_light": _st.russian_light_stem,
                    "swedish_light": _st.swedish_light_stem,
                    "finnish_light": _st.finnish_light_stem,
                    "hungarian_light": _st.hungarian_light_stem}[self.kind]
        if self.kind == "japanese":
            from lucene_ray.functions.kuromoji import (cjk_width_fold,
                                                       katakana_stem)

            return lambda t: katakana_stem(cjk_width_fold(t))
        if self.kind in ("russian", "swedish", "finnish", "hungarian",
                         "english_snowball"):
            from lucene_ray.functions import snowball as _sb

            return {"russian": _sb.russian_snowball_stem,
                    "swedish": _sb.swedish_snowball_stem,
                    "finnish": _sb.finnish_snowball_stem,
                    "hungarian": _sb.hungarian_snowball_stem,
                    "english_snowball": _sb.english_snowball_stem}[self.kind]
        if self.kind == "arabic":
            from lucene_ray.functions.stemming import (arabic_normalize,
                                                       arabic_stem)

            return lambda t: arabic_stem(arabic_normalize(t))
        if self.kind == "sorani":
            from lucene_ray.functions.stemming import sorani_stem

            return sorani_stem
        if self.kind == "hindi":
            from lucene_ray.functions.stemming import hindi_stem

            return hindi_stem
        if self.kind == "bulgarian":
            from lucene_ray.functions.stemming import bulgarian_stem

            return bulgarian_stem
        if self.kind == "indonesian":
            from lucene_ray.functions.stemming import indonesian_stem

            return indonesian_stem
        if self.kind == "czech":
            from lucene_ray.functions.stemming import czech_stem

            return czech_stem
        if self.kind == "norwegian_light":
            from lucene_ray.functions.stemming import norwegian_light_stem

            return norwegian_light_stem
        if self.kind == "latvian":
            from lucene_ray.functions.stemming import latvian_stem

            return latvian_stem
        if self.kind == "bengali":
            from lucene_ray.functions.stemming import bengali_stem

            return bengali_stem
        if self.kind == "greek":
            from lucene_ray.functions.stemming import greek_stem

            return greek_stem
        if self.kind in ("german_minimal", "french_minimal",
                         "english_minimal"):
            from lucene_ray.functions import stemming as _st

            return {"german_minimal": _st.german_minimal_stem,
                    "french_minimal": _st.french_minimal_stem,
                    "english_minimal": _st.english_minimal_stem}[self.kind]
        if self.kind in _STANDARD_LANG_KINDS and self.kind != "english":
            raise ValueError(
                f"language kind {self.kind!r} is registered but has no "
                "stemmer branch in _stem_fn")
        from lucene_ray.functions.stemming import porter_stem

        return porter_stem

    def _elide_fn(self):
        """ElisionFilter article set by chain: FrenchAnalyzer's articles for
        french (the historical default here), ItalianAnalyzer's for italian
        (it/ItalianAnalyzer.java:48-54)."""
        if self.kind == "italian":
            from lucene_ray.functions.stemming import italian_elide

            return italian_elide
        from lucene_ray.functions.stemming import french_elide

        return french_elide

    def normalize(self, term: str) -> str:
        """Query-side normalization = LowerCaseFilter only (StandardAnalyzer
        .java:98-101); chains with more normalizing filters (fold/stem) apply
        them so query terms meet index terms."""
        if (self.kind == "keyword"
                or (self.kind == "whitespace" and not self.word_delimiter
                    and not self.payload_delimiter)):
            # Keyword/WhitespaceAnalyzer normalize to identity (no
            # LowerCaseFilter); the word_delimiter and payload chains DO
            # lowercase after their split step.
            t = term
        else:
            t = term.lower()
        if self.elision:
            t = self._elide_fn()(t)
        if self.decimal_digit:
            t = _fold_digits(t)
        if self.kind == "persian":
            from lucene_ray.functions.stemming import (arabic_normalize,
                                                       persian_normalize)

            t = persian_normalize(arabic_normalize(t))
        elif self.kind == "sorani":
            from lucene_ray.functions.stemming import sorani_normalize

            t = sorani_normalize(t)
        elif self.kind == "hindi":
            from lucene_ray.functions.stemming import (hindi_normalize,
                                                       indic_normalize)

            t = hindi_normalize(indic_normalize(t))
        elif self.kind == "bengali":
            from lucene_ray.functions.stemming import (
                bengali_normalize, indic_normalize_bengali)

            t = bengali_normalize(indic_normalize_bengali(t))
        elif self.kind == "greek":
            from lucene_ray.functions.stemming import greek_lowercase

            t = greek_lowercase(t)
        if self.ascii_folding:
            from lucene_ray.functions.stemming import ascii_fold

            t = ascii_fold(t)
        if self.icu_normalize:
            from lucene_ray.functions.icu import icu_normalize

            t = icu_normalize(t)
        if self.possessive:
            from lucene_ray.functions.stemming import strip_possessive

            t = strip_possessive(t)
        if self.stem and t not in self.stem_exclusions:
            t = self._stem_fn()(t)
        return t

    def tokenize_one(self, text: str) -> list[tuple[str, int]]:
        """(term, position) list for one document — test/golden path."""
        terms, _doc_idx, positions, _lens = self.tokenize_batch([text])
        return list(zip(terms.tolist(), positions.tolist()))

    def _tokenize_arrow(self, arr) -> tuple:
        """Zero-Python-object tokenization: utf8_lower + regex split +
        dictionary_encode entirely in Arrow C++ (single large buffers — the
        hot path's memory-bandwidth saver).

        EXACT for 'simple'/'whitespace'; for 'standard' it is only taken when
        the batch passes the ASCII-simple precondition (see
        tokenize_batch_encoded) under which UAX#29 output equals the simple
        split — checked in C++ per batch, Python fallback otherwise.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        n_docs = len(arr)
        if self.kind == "whitespace":
            lists = pc.split_pattern_regex(arr, pattern=r"\s+")
        else:
            lists = pc.split_pattern_regex(pc.utf8_lower(arr), pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty)
        parents = parents.filter(nonempty)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        enc = flat.dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int32, copy=False)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        doc_idx = np.asarray(parents).astype(np.int32, copy=False)
        total = len(codes)
        counts = np.bincount(doc_idx, minlength=n_docs)
        doc_tok_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        positions = (
            np.arange(total, dtype=np.int64) - np.repeat(doc_tok_starts, counts)
        ).astype(np.int32)
        return codes, vocab, doc_idx, positions, counts

    # the batch is safe for the arrow fast path under 'standard' iff it has no
    # codepoint whose UAX#29 treatment differs from the [a-z0-9]+ split —
    # i.e. only ASCII alnum + space-ish separators, and NONE of the medial
    # joiner codepoints that _TOKEN_RE treats specially: MidLetter∪MidNumLet∪
    # SingleQuote [.:'’·] (letters), MidNum∪MidNumLet [.,;'’] (digits), and
    # ExtendNumLet '_' — every one of those is excluded from this class so the
    # two paths provably tokenize identically on any batch that matches.
    _ARROW_SAFE_RE = r"^[A-Za-z0-9 \t\n\r!\"#$%&()*+\-/<=>?@\[\]^`{|}~\\]*$"

    def tokenize_batch_encoded(
        self, texts
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Tokenize a batch into DICTIONARY-ENCODED form (the hot path).

        Returns ``(codes, vocab, doc_idx, positions, doc_lengths)``: token i
        is ``vocab[codes[i]]``; ``vocab`` is an object ndarray of the batch's
        distinct terms (unsorted). Term-level filters (max length, stop
        words) run at VOCAB size, not token count; the interning itself is
        Arrow's C++ ``dictionary_encode`` — no per-token Python loop.
        """
        n_docs = len(texts)
        empty_i = np.empty(0, dtype=np.int32)
        if n_docs == 0:
            return empty_i, np.empty(0, dtype=object), empty_i, empty_i, empty_i

        if self.char_filters:
            # CharFilters rewrite the character stream before tokenization
            # (Analyzer.initReader in the reference). No offsets here, so
            # the maps are dropped; the filtered batch re-enters the normal
            # (fast-path-eligible) flow as a fresh Arrow array.
            import pyarrow as pa

            if hasattr(texts, "to_pylist"):
                texts = texts.to_pylist()
            chain = self._char_filter_chain()
            filtered = []
            for t in texts:
                for f in chain:
                    t, _ = f(t)
                filtered.append(t)
            texts = pa.array(filtered, type=pa.string())

        if self.kind == "keyword":
            return self._tokenize_keyword(texts, n_docs)
        if self.word_delimiter:
            return self._tokenize_word_delimiter(texts, n_docs)
        if self.payload_delimiter:
            codes, vocab, doc_idx, positions, _pays, dl = (
                self.tokenize_batch_encoded_payloads(texts))
            return codes, vocab, doc_idx, positions, dl

        # Arrow fast path: input already an Arrow array (or promotable) and
        # either the chain is exactly expressible (simple/whitespace) or the
        # batch provably contains no codepoints where UAX#29 differs.
        try:
            import pyarrow as pa
            import pyarrow.compute as pc

            arr = None
            if isinstance(texts, (pa.Array, pa.ChunkedArray)):
                arr = texts if not isinstance(texts, pa.ChunkedArray) else texts.combine_chunks()
            if arr is not None:
                safe = self.kind in ("simple", "whitespace")
                # the language chains tokenize with the same
                # StandardTokenizer; their extra filters (stop/elision/stem)
                # run at vocab level AFTER tokenization, so the ASCII-simple
                # fast path is equally exact for them.
                if not safe and (self.kind == "standard"
                                 or self.kind in _STANDARD_LANG_KINDS):
                    m = pc.match_substring_regex(arr, self._ARROW_SAFE_RE)
                    safe = bool(pc.all(pc.fill_null(m, False)).as_py()) and arr.null_count == 0
                if safe:
                    codes, vocab, doc_idx, positions, counts = self._tokenize_arrow(arr)
                    return self._apply_term_filters(
                        codes, vocab, doc_idx, positions, n_docs
                    )
            if isinstance(texts, (pa.Array, pa.ChunkedArray)):
                texts = texts.to_pylist()
        except ImportError:  # pragma: no cover
            pass

        # Per-doc C-level findall. str.lower() first — the LowerCaseFilter is
        # per-codepoint (analysis/LowerCaseFilter.java:37-45); Python
        # str.lower matches Character.toLowerCase on the codepoints the
        # golden tests cover (ASCII + Latin-1); divergences (e.g. U+0130)
        # documented in tests.
        token_re = _SIMPLE_RE if self.kind == "simple" else _TOKEN_RE
        if self.kind == "whitespace":
            token_re = re.compile(r"\S+")
        elif self.kind == "cjk":
            token_re = _CJK_TOKEN_RE
        findall = token_re.findall
        # WhitespaceAnalyzer has NO LowerCaseFilter (core/.../analysis/core/
        # WhitespaceAnalyzer.java) — keep case, matching the Arrow path.
        if self.kind == "japanese":
            # tokenize the RAW text (user-dict surfaces may be cased —
            # JapaneseAnalyzer runs LowerCaseFilter LAST), lowercase the
            # emitted tokens
            jt = self._japanese_tokenizer()
            per_doc = [[s.lower() for s in jt.tokenize_surfaces(t)]
                       for t in texts]
        elif self.kind == "korean":
            # POS stop filter fused into tokenize_surfaces; LowerCaseFilter
            # runs last like the reference chain (Latin SL tokens —
            # Hangul has no case)
            kt = self._korean_tokenizer()
            per_doc = [[s.lower() for s in kt.tokenize_surfaces(t)]
                       for t in texts]
        elif self.kind == "smart_chinese":
            ct = self._chinese_tokenizer()
            per_doc = [ct.tokenize_surfaces(t) for t in texts]
        elif self.kind == "thai":
            tt = self._thai_tokenizer()
            per_doc = [[s.lower() for s in tt.tokenize_surfaces(t)]
                       for t in texts]
        elif self.kind == "whitespace":
            per_doc = [findall(t) for t in texts]
        else:
            per_doc = [findall(t.lower()) for t in texts]
        if self.kind == "cjk":
            per_doc = [_cjk_expand(toks) for toks in per_doc]
        counts = np.fromiter((len(p) for p in per_doc), dtype=np.int64, count=n_docs)
        total = int(counts.sum())
        if total == 0:
            return (
                empty_i,
                np.empty(0, dtype=object),
                empty_i,
                empty_i,
                np.zeros(n_docs, dtype=np.int32),
            )

        import itertools

        import pyarrow as pa

        flat = list(itertools.chain.from_iterable(per_doc))
        dic = pa.chunked_array([pa.array(flat, type=pa.string())]).combine_chunks()
        enc = dic.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int32)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)

        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int32), counts)
        # position = token ordinal within its doc over ALL tokens the tokenizer
        # produced (overlong/stop tokens are dropped AFTER ordinal assignment,
        # which reproduces the posIncr-bump semantics).
        doc_tok_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        positions = (np.arange(total, dtype=np.int64) - np.repeat(doc_tok_starts, counts)).astype(
            np.int32
        )

        return self._apply_term_filters(codes, vocab, doc_idx, positions, n_docs)

    def _tokenize_keyword(self, texts, n_docs: int):
        """KeywordAnalyzer: whole input = one token (empty input = none),
        fully vectorized through one Arrow dictionary_encode."""
        import pyarrow as pa

        if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
            texts = pa.array(list(texts), type=pa.string())
        elif isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        import pyarrow.compute as pc

        keep = pc.and_(texts.is_valid(), pc.not_equal(
            pc.fill_null(texts, ""), ""))
        keep_np = np.asarray(keep)
        kept = texts.filter(keep)
        enc = kept.dictionary_encode()
        codes = np.asarray(enc.indices).astype(np.int32, copy=False)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        doc_idx = np.flatnonzero(keep_np).astype(np.int32)
        positions = np.zeros(len(codes), dtype=np.int32)
        return self._apply_term_filters(codes, vocab, doc_idx, positions,
                                        n_docs)

    def _whitespace_encode(self, texts, n_docs: int):
        """Shared whitespace-tokenize + dictionary-encode scaffolding for
        the WDGF / payload chains: ``(codes, vocab_list, counts, total,
        doc_idx_tok)`` with original-case tokens; ``total == 0`` means the
        caller short-circuits (codes/vocab/doc_idx are None then)."""
        import itertools

        import pyarrow as pa

        if hasattr(texts, "to_pylist"):
            texts = texts.to_pylist()
        ws = re.compile(r"\S+")
        per_doc = [ws.findall(t) for t in texts]
        counts = np.fromiter((len(p) for p in per_doc), dtype=np.int64,
                             count=n_docs)
        total = int(counts.sum())
        if total == 0:
            return None, None, counts, 0, None
        flat = list(itertools.chain.from_iterable(per_doc))
        enc = pa.array(flat, type=pa.string()).dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int64)
        vocab = enc.dictionary.to_pylist()
        doc_idx_tok = np.repeat(np.arange(n_docs, dtype=np.int32), counts)
        return codes, vocab, counts, total, doc_idx_tok

    def _tokenize_word_delimiter(self, texts, n_docs: int):
        """whitespace → WordDelimiterGraphFilter → LowerCase index chain.

        The expansion of a token is a pure function of its text, so it runs
        at VOCAB level (once per distinct original-case term) and the parts
        are spliced into flat (code, doc, position) arrays with numpy
        gathers — graph positions included (catenations / preserved
        originals stack at their part position; swallowed all-delimiter
        tokens leave a one-position hole, WordDelimiterGraphFilter.java
        accumPosInc)."""
        import pyarrow as pa

        from lucene_ray.functions.worddelimiter import expand_vocab

        empty_i = np.empty(0, dtype=np.int32)
        # WhitespaceTokenizer, ORIGINAL case (case transitions drive splits)
        codes, orig_vocab, counts, total, doc_idx_tok = (
            self._whitespace_encode(texts, n_docs))
        if total == 0:
            return (empty_i, np.empty(0, dtype=object), empty_i, empty_i,
                    np.zeros(n_docs, dtype=np.int32))
        table = expand_vocab(orig_vocab, self.word_delimiter,
                             self.protected_words)
        # flatten the per-vocab-entry part lists into gatherable arrays
        part_terms: list[str] = []
        part_relpos: list[int] = []
        v_off = np.zeros(len(table) + 1, dtype=np.int64)
        adv = np.empty(len(table), dtype=np.int64)
        for i, (parts, relpos, advance) in enumerate(table):
            part_terms.extend(p.lower() for p in parts)
            part_relpos.extend(relpos)
            v_off[i + 1] = v_off[i] + len(parts)
            adv[i] = advance
        part_enc = pa.array(part_terms, type=pa.string()).dictionary_encode()
        part_ids = np.asarray(part_enc.indices, dtype=np.int32)
        part_vocab = np.asarray(part_enc.dictionary.to_pylist(), dtype=object)
        relpos_arr = np.asarray(part_relpos, dtype=np.int64)

        # per-token base position = per-doc exclusive cumsum of advances.
        # np.repeat BEFORE indexing: trailing empty docs have
        # doc_tok_starts == total which would index past cum, but they
        # repeat zero times so never materialize.
        adv_tok = adv[codes]
        cum = np.cumsum(adv_tok) - adv_tok
        doc_tok_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        base = cum - cum[np.repeat(doc_tok_starts, counts)]

        # splice: each token occurrence expands to lens_v[code] parts
        lens_v = (v_off[1:] - v_off[:-1])[codes]
        n_out = int(lens_v.sum())
        starts_v = v_off[:-1][codes]
        within = np.arange(n_out, dtype=np.int64) - np.repeat(
            np.cumsum(lens_v) - lens_v, lens_v)
        gather = np.repeat(starts_v, lens_v) + within
        out_codes = part_ids[gather]
        positions = (np.repeat(base, lens_v) + relpos_arr[gather]).astype(
            np.int32)
        out_doc_idx = np.repeat(doc_idx_tok, lens_v)
        # field length discounts STACKED tokens (posInc 0: catenations /
        # preserved originals share a part's position) — BM25Similarity's
        # discountOverlaps=true default (search/similarity/BM25Similarity
        # .java setDiscountOverlaps): length = tokens that advance position
        # = distinct relative positions per original token. (With explicit
        # stop_words on a WDGF chain the discount is computed pre-filter —
        # documented divergence; the reference chain has no stop filter.)
        nd = np.fromiter((len(set(relpos)) for _p, relpos, _a in table),
                         dtype=np.int64, count=len(table))
        dl_override = np.bincount(
            doc_idx_tok, weights=nd[codes].astype(np.float64),
            minlength=n_docs).astype(np.int32)
        out = self._apply_term_filters(out_codes, part_vocab, out_doc_idx,
                                       positions, n_docs)
        codes_f, vocab_f, doc_idx_f, positions_f, _dl = out
        return codes_f, vocab_f, doc_idx_f, positions_f, dl_override

    def tokenize_batch_encoded_payloads(self, texts):
        """whitespace → DelimitedPayloadTokenFilter(FloatEncoder) →
        LowerCase chain: ``(codes, vocab, doc_idx, positions, payloads,
        doc_lengths)`` with one float32 payload per occurrence (0.0 when a
        token carries no delimiter — the reference leaves the payload
        attribute unset there).

        The (term, payload) split is a pure function of the token text, so
        it runs at VOCAB level; per-occurrence payloads are one gather."""
        import pyarrow as pa

        if not self.payload_delimiter:
            raise ValueError("analyzer has no payload_delimiter configured")
        n_docs = len(texts)
        empty_i = np.empty(0, dtype=np.int32)
        codes, raw_vocab, counts, total, doc_idx = (
            self._whitespace_encode(texts, n_docs))
        if total == 0:
            return (empty_i, np.empty(0, dtype=object), empty_i, empty_i,
                    np.empty(0, dtype=np.float32),
                    np.zeros(n_docs, dtype=np.int32))
        delim = self.payload_delimiter
        terms, pays = [], np.zeros(len(raw_vocab), dtype=np.float32)
        for i, w in enumerate(raw_vocab):
            j = w.find(delim)
            if j >= 0:
                terms.append(w[:j].lower())
                try:
                    pays[i] = np.float32(w[j + 1:])
                except ValueError as exc:
                    raise ValueError(
                        f"payload of token {w!r} is not a float") from exc
            else:
                terms.append(w.lower())
        term_enc = pa.array(terms, type=pa.string()).dictionary_encode()
        new_ids = np.asarray(term_enc.indices, dtype=np.int32)
        vocab = np.asarray(term_enc.dictionary.to_pylist(), dtype=object)
        payloads = pays[codes]
        out_codes = new_ids[codes]
        doc_tok_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        positions = (np.arange(total, dtype=np.int64)
                     - np.repeat(doc_tok_starts, counts)).astype(np.int32)
        # vocab-level filters (stop/min/max/keep) apply like every other
        # chain; the per-occurrence payload array rides the keep mask
        # through the offsets channel (it filters any parallel pair)
        out_codes, vocab, doc_idx, positions, doc_lengths, (payloads, _) = (
            self._apply_term_filters(out_codes, vocab, doc_idx, positions,
                                     n_docs, offsets=(payloads, payloads),
                                     return_offsets=True))
        return (out_codes, vocab, doc_idx, positions, payloads, doc_lengths)

    def tokenize_batch_encoded_offsets(self, texts):
        """Offsets-aware tokenization: like :meth:`tokenize_batch_encoded`
        but also returns per-token CHARACTER offsets into the ORIGINAL
        stored text — ``(codes, vocab, doc_idx, positions, starts, ends,
        doc_lengths)``.

        The reference stores offsets in the postings when a field indexes
        ``DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS``
        (index/IndexOptions.java:24, Lucene90PostingsWriter.java:84-117
        ``.pay``); this is the index-side producer for that opt-in path.
        Uses ``finditer`` over the original text (tokens lowercased after
        matching) — a per-doc C loop rather than the megastring fast path,
        which is the price of span-accurate offsets; offsets indexing is
        opt-in exactly like the reference's."""
        import itertools

        import pyarrow as pa

        n_docs = len(texts)
        empty_i = np.empty(0, dtype=np.int32)
        if hasattr(texts, "to_pylist"):
            texts = texts.to_pylist()
        cf_maps = None
        if self.char_filters:
            # spans are found in FILTERED text, then corrected back to the
            # original stored text through each stage's OffsetMap (the
            # CharFilter.correctOffset contract)
            from lucene_ray.functions.charfilters import apply_char_filters

            chain = self._char_filter_chain()
            filtered, cf_maps = [], []
            for t in texts:
                ft, maps = apply_char_filters(t, chain)
                filtered.append(ft)
                cf_maps.append(maps)
            texts = filtered
        if self.kind == "cjk":
            # bigram expansion has no 1:1 token↔source-span mapping yet —
            # refuse rather than silently index un-bigrammed terms that a
            # cjk-analyzed query would never match
            raise ValueError(
                "store_offsets is not supported with the 'cjk' analyzer")
        if self.kind in ("japanese", "korean", "smart_chinese", "thai"):
            # user-dictionary segments split one source span — refuse
            # offsets like cjk rather than emit misaligned spans
            raise ValueError(
                f"store_offsets is not supported with the {self.kind!r} "
                "analyzer")
        if self.word_delimiter:
            # graph expansion is not span-preserving (catenations cover
            # multiple source spans); refuse like cjk
            raise ValueError(
                "store_offsets is not supported with word_delimiter")
        if n_docs == 0:
            e = np.empty(0, dtype=object)
            return empty_i, e, empty_i, empty_i, empty_i, empty_i, empty_i
        if self.kind == "keyword":
            per_doc = [[(t, 0, len(t))] if t else [] for t in texts]
            counts = np.fromiter((len(p) for p in per_doc), dtype=np.int64,
                                 count=n_docs)
            total = int(counts.sum())
            if total == 0:
                z = np.zeros(n_docs, dtype=np.int32)
                return (empty_i, np.empty(0, dtype=object), empty_i, empty_i,
                        empty_i, empty_i, z)
            return self._finish_offsets(per_doc, counts, total, n_docs,
                                        cf_maps)
        if self.kind == "simple":
            token_re = re.compile(r"[a-z0-9]+", re.IGNORECASE)
        elif self.kind == "whitespace":
            token_re = re.compile(r"\S+")
        else:
            token_re = _TOKEN_RE  # letter classes already match both cases
        if self.kind == "whitespace":
            # WhitespaceAnalyzer: no LowerCaseFilter
            per_doc = [
                [(m.group(), m.start(), m.end())
                 for m in token_re.finditer(t)]
                for t in texts
            ]
        else:
            per_doc = [
                [(m.group().lower(), m.start(), m.end())
                 for m in token_re.finditer(t)]
                for t in texts
            ]
        counts = np.fromiter((len(p) for p in per_doc), dtype=np.int64, count=n_docs)
        total = int(counts.sum())
        if total == 0:
            z = np.zeros(n_docs, dtype=np.int32)
            return (empty_i, np.empty(0, dtype=object), empty_i, empty_i,
                    empty_i, empty_i, z)
        return self._finish_offsets(per_doc, counts, total, n_docs, cf_maps)

    def _finish_offsets(self, per_doc, counts, total, n_docs, cf_maps=None):
        """Shared tail of the offsets tokenize path: flatten the per-doc
        (token, start, end) triples, correct spans through any CharFilter
        maps, intern, and run the vocab-level filters."""
        import itertools

        import pyarrow as pa

        flat = list(itertools.chain.from_iterable(per_doc))
        toks = pa.array([t[0] for t in flat], type=pa.string())
        starts = np.fromiter((t[1] for t in flat), dtype=np.int32, count=total)
        ends = np.fromiter((t[2] for t in flat), dtype=np.int32, count=total)
        if cf_maps is not None:
            from lucene_ray.functions.charfilters import correct_spans

            bounds = np.concatenate([[0], np.cumsum(counts)])
            for d in range(n_docs):
                maps = cf_maps[d]
                if not any(m.offsets for m in maps):
                    continue
                lo, hi = int(bounds[d]), int(bounds[d + 1])
                s_c, e_c = correct_spans(
                    starts[lo:hi].astype(np.int64), ends[lo:hi].astype(np.int64),
                    maps)
                starts[lo:hi] = s_c.astype(np.int32)
                ends[lo:hi] = e_c.astype(np.int32)
        enc = toks.dictionary_encode()
        codes = np.asarray(enc.indices, dtype=np.int32)
        vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int32), counts)
        doc_tok_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        positions = (
            np.arange(total, dtype=np.int64) - np.repeat(doc_tok_starts, counts)
        ).astype(np.int32)
        codes, vocab, doc_idx, positions, doc_lengths, (starts, ends) = (
            self._apply_term_filters(codes, vocab, doc_idx, positions, n_docs,
                                     offsets=(starts, ends), return_offsets=True)
        )
        return codes, vocab, doc_idx, positions, starts, ends, doc_lengths

    def _apply_term_filters(self, codes, vocab, doc_idx, positions, n_docs,
                            offsets=None, return_offsets=False):
        """Vocab-level transforms (possessive strip, ascii fold, stemming) +
        max-length / stop-word filters + per-doc lengths. Runs at vocabulary
        size, not token count."""
        if self.elision and len(vocab):
            elide_fn = self._elide_fn()
            vocab = np.array([elide_fn(t) for t in vocab], dtype=object)
        if self.possessive and len(vocab):
            from lucene_ray.functions.stemming import strip_possessive

            vocab = np.array([strip_possessive(t) for t in vocab], dtype=object)
        if self.ascii_folding and len(vocab):
            from lucene_ray.functions.stemming import ascii_fold

            vocab = np.array([ascii_fold(t) for t in vocab], dtype=object)
        if self.icu_normalize and len(vocab):
            from lucene_ray.functions.icu import icu_normalize

            vocab = np.array([icu_normalize(t) for t in vocab], dtype=object)
        if self.decimal_digit and len(vocab):
            vocab = np.array([_fold_digits(t) for t in vocab], dtype=object)
        if self.kind in _PRE_STOP_NORM_KINDS and len(vocab):
            # pre-stop normalization (these chains filter stopwords AGAINST
            # the normalized forms). Hindi's/Bengali's keyword marker sits
            # between DecimalDigit and IndicNormalization in the reference
            # — but IndicNormalizationFilter has NO keyword check, only the
            # language normalizer and stemmer respect the marker. So
            # excluded terms still get the Indic composition pass (matched
            # on the pre-Indic form), and skip only the language step;
            # persian/sorani mark keywords after normalization entirely.
            indic = None
            if self.kind == "persian":
                from lucene_ray.functions.stemming import (arabic_normalize,
                                                           persian_normalize)

                lang = lambda t: persian_normalize(arabic_normalize(t))  # noqa: E731
            elif self.kind == "sorani":
                from lucene_ray.functions.stemming import sorani_normalize

                lang = sorani_normalize
            elif self.kind == "bengali":
                from lucene_ray.functions.stemming import (
                    bengali_normalize, indic_normalize_bengali)

                indic, lang = indic_normalize_bengali, bengali_normalize
            elif self.kind == "greek":
                from lucene_ray.functions.stemming import greek_lowercase

                lang = greek_lowercase
            else:
                from lucene_ray.functions.stemming import (hindi_normalize,
                                                           indic_normalize)

                indic, lang = indic_normalize, hindi_normalize
            excl = (self.stem_exclusions
                    if self.kind in ("hindi", "bengali") else frozenset())
            vocab = np.array(
                [(indic(t) if indic else t) if t in excl
                 else lang(indic(t) if indic else t) for t in vocab],
                dtype=object)
        vocab_keep = np.ones(len(vocab), dtype=bool)
        if (self.min_token_length or self.max_token_length) and len(vocab):
            vlens = np.fromiter(map(len, vocab), dtype=np.int32,
                                count=len(vocab))
            if self.min_token_length:
                vocab_keep &= vlens >= self.min_token_length
            if self.max_token_length:
                vocab_keep &= vlens <= self.max_token_length
        if self.keep_words and len(vocab):
            kw = self.keep_words
            vocab_keep &= np.fromiter(
                (t in kw for t in vocab), dtype=bool, count=len(vocab))
        if self.stop_words:
            sw = self.stop_words
            vocab_keep &= np.fromiter(
                (t not in sw for t in vocab), dtype=bool, count=len(vocab)
            )
        if not vocab_keep.all():
            keep = vocab_keep[codes]
            codes = codes[keep]
            doc_idx = doc_idx[keep]
            positions = positions[keep]
            if offsets is not None:
                offsets = (offsets[0][keep], offsets[1][keep])
        if self.stem and len(vocab):
            stem_fn = self._stem_fn()
            excl = self.stem_exclusions
            vocab = np.array(
                [t if t in excl else stem_fn(t) for t in vocab], dtype=object)
        if (self.stem or self.possessive or self.ascii_folding
                or self.elision or self.decimal_digit or self.icu_normalize
                or self.kind in _PRE_STOP_NORM_KINDS) and len(vocab):
            # transforms can merge vocab entries — re-intern (decimal-digit
            # folding and the persian/sorani normalizers merge too: e.g.
            # arabic kaf and farsi keheh fold to one term)
            vocab, inv = np.unique(vocab, return_inverse=True)
            codes = inv[codes].astype(np.int32) if len(codes) else codes
        doc_lengths = np.bincount(doc_idx, minlength=n_docs).astype(np.int32)
        if self.compound_dictionary and len(vocab):
            if return_offsets:
                raise ValueError(
                    "store_offsets is not supported with compound_dictionary")
            codes, vocab, doc_idx, positions = self._expand_compounds(
                codes, vocab, doc_idx, positions)
            # doc_lengths unchanged: stacked subwords are posInc-0 overlaps
            # (BM25Similarity discountOverlaps=true default)
        if self.phonetic == "double_metaphone" and len(vocab):
            # DoubleMetaphoneFilter (analysis/phonetic/.../
            # DoubleMetaphoneFilter.java:28): emits primary AND alternate
            # codes. inject=True stacks [original, primary, alternate≠
            # primary] at one position; inject=False replaces the original
            # with the primary and stacks the alternate. Unconvertible
            # tokens (primary empty or == token) pass through unchanged.
            from lucene_ray.functions.metaphone import double_metaphone_codes

            codes_pa = [double_metaphone_codes(w, self.phonetic_max_code_len)
                        for w in vocab]
            if return_offsets:
                raise ValueError("store_offsets is not supported with "
                                 "phonetic tokens")
            # DoubleMetaphoneFilter.java emits the alternate whenever it is
            # nonempty, != primary AND != original — independent of whether
            # the primary matched the token (e.g. token 'SML': primary ==
            # token, alternate 'XML' still indexes)
            if self.phonetic_inject:
                extras = [([p] if p and p != w else [])
                          + ([a] if a and a != p and a != w else [])
                          for w, (p, a) in zip(vocab, codes_pa)]
                codes, vocab, doc_idx, positions = self._splice_stacked(
                    codes, vocab, doc_idx, positions, extras,
                    extras_first=False)
            else:
                extras = [[a] if a and a != p and a != w else []
                          for w, (p, a) in zip(vocab, codes_pa)]
                vocab = np.array(
                    [p if p and p != w else w
                     for w, (p, _a) in zip(vocab, codes_pa)], dtype=object)
                codes, vocab, doc_idx, positions = self._splice_stacked(
                    codes, vocab, doc_idx, positions, extras,
                    extras_first=False)
        elif self.phonetic and len(vocab):
            from lucene_ray.functions.metaphone import metaphone
            from lucene_ray.functions.stemming import (refined_soundex,
                                                       soundex)

            ml = self.phonetic_max_code_len
            enc = {"soundex": soundex,
                   "refined_soundex": refined_soundex,
                   "metaphone": lambda w: metaphone(w, ml)}.get(self.phonetic)
            if enc is None:
                raise ValueError(f"unknown phonetic encoder {self.phonetic!r}")
            if self.phonetic_inject:
                if return_offsets:
                    raise ValueError("store_offsets is not supported with "
                                     "injected phonetic tokens")
                # encoded token stacked before the kept original (posInc 0)
                extras = [[e] if (e := enc(w)) and e != w else []
                          for w in vocab]
                codes, vocab, doc_idx, positions = self._splice_stacked(
                    codes, vocab, doc_idx, positions, extras,
                    extras_first=True)
                # doc_lengths unchanged (stacked overlaps discounted)
            else:
                vocab = np.array([enc(w) or w for w in vocab], dtype=object)
                vocab, inv = np.unique(vocab, return_inverse=True)
                codes = inv[codes].astype(np.int32) if len(codes) else codes
        if return_offsets:
            return codes, vocab, doc_idx, positions, doc_lengths, offsets
        return codes, vocab, doc_idx, positions, doc_lengths

    def _expand_compounds(self, codes, vocab, doc_idx, positions):
        """DictionaryCompoundWordTokenFilter.decompose at VOCAB level: for
        each distinct term, find dictionary subwords once; splice them into
        the flat arrays at the original's position with numpy gathers."""
        dic = self.compound_dictionary
        min_w, min_s, max_s = (self.compound_min_word, self.compound_min_sub,
                               self.compound_max_sub)
        only_longest = self.compound_only_longest
        subs_per: list[list[str]] = []
        any_subs = False
        for w in vocab:
            subs: list[str] = []
            if len(w) >= min_w:
                for i in range(0, len(w) - min_s + 1):
                    longest = None
                    for j in range(min_s, max_s + 1):
                        if i + j > len(w):
                            break
                        cand = w[i:i + j]
                        # CharArraySet(dictionary, ignoreCase=true) — the
                        # reference matches case-insensitively and emits the
                        # original-case slice
                        if cand.lower() in dic:
                            if only_longest:
                                longest = cand
                            else:
                                subs.append(cand)
                    if only_longest and longest is not None:
                        subs.append(longest)
            subs_per.append(subs)
            any_subs = any_subs or bool(subs)
        if not any_subs:
            return codes, vocab, doc_idx, positions
        return self._splice_stacked(codes, vocab, doc_idx, positions,
                                    subs_per, extras_first=False)

    def _splice_stacked(self, codes, vocab, doc_idx, positions, extras_per,
                        *, extras_first: bool):
        """Splice per-vocab-entry EXTRA tokens into the flat arrays at the
        original's position (posInc-0 stacking) — one numpy gather; shared
        by the compound decompounder and the phonetic filter."""
        import pyarrow as pa

        part_terms: list[str] = []
        v_off = np.zeros(len(vocab) + 1, dtype=np.int64)
        for i, w in enumerate(vocab):
            if extras_first:
                part_terms.extend(extras_per[i])
                part_terms.append(w)
            else:
                part_terms.append(w)
                part_terms.extend(extras_per[i])
            v_off[i + 1] = v_off[i] + 1 + len(extras_per[i])
        enc = pa.array(part_terms, type=pa.string()).dictionary_encode()
        part_ids = np.asarray(enc.indices, dtype=np.int32)
        new_vocab = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        lens_v = (v_off[1:] - v_off[:-1])[codes]
        n_out = int(lens_v.sum())
        within = np.arange(n_out, dtype=np.int64) - np.repeat(
            np.cumsum(lens_v) - lens_v, lens_v)
        gather = np.repeat(v_off[:-1][codes], lens_v) + within
        return (part_ids[gather], new_vocab,
                np.repeat(doc_idx, lens_v),
                np.repeat(positions, lens_v))

    def tokenize_batch(
        self, texts: list[str]
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Materialized-token variant of :meth:`tokenize_batch_encoded` —
        ``(terms, doc_idx, positions, doc_lengths)`` with ``terms`` an object
        ndarray of token strings (golden tests / small batches)."""
        codes, vocab, doc_idx, positions, doc_lengths = self.tokenize_batch_encoded(texts)
        terms = vocab[codes] if len(codes) else np.empty(0, dtype=object)
        return terms, doc_idx, positions, doc_lengths


def get_analyzer(kind: str = "standard", **kw) -> Analyzer:
    """Build an analyzer from a spec. ``kind`` may carry ``+flag`` suffixes
    that survive the manifest round-trip as plain strings (the index build
    persists the spec; the searcher reconstructs the identical chain from
    it): ``standard+fold`` = StandardAnalyzer + ASCIIFolding, ``english+fold``
    etc. Recognized flags: fold/folding (ascii_folding), stem (PorterStem),
    possessive (EnglishPossessiveFilter).

    ``kind`` may also be a DICT spec (CustomAnalyzer-style, JSON-able so it
    rides the manifest unchanged): ``{"kind": "standard", "char_filters":
    [{"type": "html_strip"}, {"type": "mapping", "rules": {...}}], ...}`` —
    any Analyzer field is accepted as a key."""
    if isinstance(kind, Analyzer):
        return kind
    if isinstance(kind, dict):
        spec = dict(kind)
        base_spec = spec.pop("kind", "standard")
        cf = spec.pop("char_filters", None)
        if cf is not None:
            spec["char_filters"] = tuple(cf)
        for k in ("stop_words", "stem_exclusions", "protected_words",
                  "keep_words", "compound_dictionary"):
            if k in spec:
                spec[k] = frozenset(spec[k])
        return get_analyzer(base_spec, **{**spec, **kw})
    base, *flags = kind.split("+")
    for f in flags:
        if f in ("fold", "folding", "ascii_folding"):
            kw.setdefault("ascii_folding", True)
        elif f == "stem":
            kw.setdefault("stem", True)
        elif f == "possessive":
            kw.setdefault("possessive", True)
        else:
            raise ValueError(f"unknown analyzer flag {f!r} in spec {kind!r}")
    return Analyzer(kind=base, **kw)


# --------------------------------------------------------- n-gram / shingle

def shingle_tokens(tokens: list[str], min_size: int = 2, max_size: int = 2,
                   sep: str = " ") -> list[str]:
    """Word n-grams (ShingleFilter, analysis/common/.../shingle/ShingleFilter
    .java semantics, unigrams not included): all contiguous runs of
    min_size..max_size tokens joined by ``sep``."""
    out = []
    n = len(tokens)
    for size in range(min_size, max_size + 1):
        for i in range(n - size + 1):
            out.append(sep.join(tokens[i : i + size]))
    return out


def char_ngrams(term: str, min_gram: int = 2, max_gram: int = 3) -> list[str]:
    """Character n-grams of a term (NGramTokenFilter semantics: all grams of
    each size, in order)."""
    out = []
    for size in range(min_gram, max_gram + 1):
        for i in range(len(term) - size + 1):
            out.append(term[i : i + size])
    return out


def edge_ngrams(term: str, min_gram: int = 1, max_gram: int = 5) -> list[str]:
    """Front edge n-grams (EdgeNGramTokenFilter) — the autocomplete primitive."""
    return [term[:size] for size in range(min_gram, min(max_gram, len(term)) + 1)]
