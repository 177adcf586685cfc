"""Per-language analyzer selection registry.

The reference ships three capability tiers (``/root/reference/src/wikirec/
languages.py``: lemmatizable :31-47, stemmable :63-68, stopword-only
:84-126) and picks the cleaning path per language at
``data_utils.py:730-754`` (full language name → abbreviation → stopword
source).  This registry reproduces the same capability partition as data —
all 60 language entries, both the full name and ISO-639-1 code resolve —
with the semantics re-expressed for the engine:

  "lemmatize"  — spaCy model exists upstream (actor-pool stage T1; this
                 container gates it and falls back to rules, stem.py)
  "stem"       — Snowball-family stemmer fallback (reference :906-940)
  "stopwords"  — stopword removal only (reference: stopwords-iso)
  "tokenize"   — whitespace/punct tokenization only (ultimate fallback for
                 unknown codes; the reference raises instead,
                 data_utils.py:750-754 — degrading keeps a 100 TB run alive
                 on long-tail languages)

Stopword SETS ship for the languages the synthetic corpus and tests
exercise (small public function-word lists, the same spirit as
analyze.DEFAULT_STOPWORDS); real deployments register their own full lists
per language.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LanguageSpec:
    code: str
    name: str
    capability: str  # lemmatize | stem | stopwords | tokenize


_REGISTRY: dict[str, LanguageSpec] = {}
_BY_NAME: dict[str, LanguageSpec] = {}


def register(code: str, name: str, capability: str) -> None:
    if capability not in ("lemmatize", "stem", "stopwords", "tokenize"):
        raise ValueError(f"unknown capability {capability!r}")
    spec = LanguageSpec(code, name, capability)
    _REGISTRY[code] = spec
    _BY_NAME[name] = spec


# Tier 1 — spaCy-lemmatizable (reference languages.py:31-47).  The engine
# treats zh/ja as lemmatize-capable to match the reference's table even
# though its own rule fallback is suffix-based.
for _name, _code in [
    ("chinese", "zh"), ("danish", "da"), ("dutch", "nl"), ("english", "en"),
    ("french", "fr"), ("german", "de"), ("greek", "el"), ("italian", "it"),
    ("japanese", "ja"), ("lithuanian", "lt"), ("norwegian_bokmal", "nb"),
    ("polish", "pl"), ("portuguese", "pt"), ("romanian", "ro"),
    ("spanish", "es"),
]:
    register(_code, _name, "lemmatize")

# Tier 2 — stemmable via Snowball (reference languages.py:63-68)
for _name, _code in [
    ("arabic", "ar"), ("finnish", "fi"), ("hungarian", "hu"), ("swedish", "sv"),
]:
    register(_code, _name, "stem")

# Tier 3 — stopword-removal only (reference languages.py:84-126; "farsi"
# and "persian" are aliases for the same code there)
for _name, _code in [
    ("afrikaans", "af"), ("bulgarian", "bg"), ("bengali", "bn"),
    ("breton", "br"), ("catalan", "ca"), ("czech", "cs"), ("esperanto", "eo"),
    ("estonian", "et"), ("basque", "eu"), ("farsi", "fa"), ("persian", "fa"),
    ("irish", "ga"), ("galician", "gl"), ("gujarati", "gu"), ("hausa", "ha"),
    ("hebrew", "he"), ("hindi", "hi"), ("croatian", "hr"), ("armenian", "hy"),
    ("indonesian", "id"), ("korean", "ko"), ("kurdish", "ku"), ("latin", "la"),
    ("latvian", "lv"), ("marathi", "mr"), ("malay", "ms"), ("norwegian", "no"),
    ("russian", "ru"), ("slovak", "sk"), ("slovenian", "sl"), ("somali", "so"),
    ("sotho", "st"), ("swahili", "sw"), ("thai", "th"), ("tagalog", "tl"),
    ("turkish", "tr"), ("ukrainian", "uk"), ("urdu", "ur"),
    ("vietnamese", "vi"), ("yoruba", "yo"), ("zulu", "zu"),
]:
    register(_code, _name, "stopwords")


def spec_for(code_or_name: str) -> LanguageSpec:
    """Analyzer capability for a language code OR full name (the reference
    accepts full names and maps via its abbreviation dicts,
    data_utils.py:730-754); unknown values degrade to tokenize-only."""
    key = code_or_name.lower()
    if key in _REGISTRY:
        return _REGISTRY[key]
    if key in _BY_NAME:
        return _BY_NAME[key]
    return LanguageSpec(key, key, "tokenize")


def supported() -> dict[str, LanguageSpec]:
    return dict(_REGISTRY)


# --- per-language stopword sets -------------------------------------------
# Function-word lists for EVERY language in the registry, embedded as data
# (the reference pulls full lists from stopwords-iso at runtime,
# data_utils.py:715-728 — public data; these are compact snapshots of the
# same high-frequency function words).  Forms are stored in their CORRECT
# native orthography — the cleaning chain performs no accent folding, so an
# accent-stripped 'fur' would never match real German 'für' AND would
# wrongly drop the English word in mixed corpora (ADVICE r03).  For the
# Latin-script lists whose words commonly appear accent-stripped in
# ASCII-ized corpora (de/es/fr/it), the stripped variants are retained
# alongside the accented forms.  Replaceable via the ``stopwords=``
# parameter of every cleaning stage.
STOPWORDS_BY_LANG: dict[str, frozenset[str]] = {
    # -- tier 1 (lemmatizable) ---------------------------------------------
    "da": frozenset(
        """og i jeg det at en den til er som på de med han af for ikke der
        var mig sig men et har om vi min havde ham hun nu over da fra du ud
        sin dem os op man hans hvor eller hvad skal selv her alle vil blev
        kunne ind når være dog noget ville jo deres efter ned skulle denne
        end dette mit også under have dig anden hende mine alt meget sit
        sine vor mod disse hvis din nogle hos blive mange ad bliver hendes
        været thi jer sådan""".split()
    ),
    "nl": frozenset(
        """de en van ik te dat die in een hij het niet zijn is was op aan
        met als voor had er maar om hem dan zou of wat mijn men dit zo door
        over ze zich bij ook tot je mij uit der daar haar naar heb hoe heeft
        hebben deze u want nog zal me zij nu ge geen omdat iets worden toch
        al waren veel meer doen toen moet ben zonder kan hun dus alles onder
        ja eens hier wie werd altijd doch wordt wezen kunnen ons zelf tegen
        na reeds wil kon niets uw iemand geweest andere""".split()
    ),
    "en": frozenset(),  # resolved via analyze.DEFAULT_STOPWORDS in stopwords_for
    "fr": frozenset(
        """le la les de des du et en un une est pour que dans il elle au aux
        ce cette ne pas plus par sur avec son sa ses ils ont mais ou si leur
        bien être fait tout nous vous je tu on dont etre où qui quoi quand
        comme ainsi alors après avant aussi autre ces cet chaque comment
        depuis donc elles encore entre eux ici même mes moins mon ma notre
        nos votre vos peu peut sans sont soit sous suis était été cela ça
        très y a à j'ai c'est n'est d'un d'une meme apres etait ete tres
        deja déjà""".split()
    ),
    "de": frozenset(
        """der die das und ist von zu mit den im für auf ein eine nicht als
        auch aus bei nach wie über dem des einem einen einer sich oder wird
        war sind haben hat wenn noch nur durch kann mehr schon hier alle
        aber am an bin bis dann dass du er es ihr ihre ihrem ihren ihrer
        ihres mein meine mich mir muss nein nichts ohne sehr sein seine so
        um uns unter vom vor waren werde werden wir wo zum zur zwischen
        jetzt immer man kein keine doch beim gegen dieser diese dieses
        fur uber dass daß wurde würde könnte konnte sollte musste müssen
        mussen""".split()
    ),
    "el": frozenset(
        """ο η το οι τα του της των τον την και κι κ είναι ήταν να σε με για
        από στο στη στην στον στα στις στους ένα μία μια δεν μη μην που πως
        πώς ότι ό,τι αν θα ως σαν αλλά όμως ή είτε ούτε κάθε όλα όλοι όλες
        αυτό αυτή αυτός αυτοί αυτές αυτά εγώ εσύ εμείς εσείς μου σου μας σας
        τους τις τι ποιος ποια ποιο πότε πού γιατί επειδή ενώ όταν τότε τώρα
        εδώ εκεί πολύ πιο κάτι τίποτα κάποιος""".split()
    ),
    "it": frozenset(
        """il lo la i gli le di a da in con su per tra fra un uno una che e
        non si al allo alla dei degli delle nel nello nella sono era ha
        hanno questo questa come anche più ma se o piu ed io tu lui lei noi
        voi loro mi ti ci vi ne è sia fu essere stato stata avere aveva
        quando dove perché perche chi cui quale quali tutto tutti tutte
        altra altro altri senza dopo prima ancora già gia sempre mai qui
        quella quello quelle quelli ogni molto poco sul sulla sulle sugli
        dal dalla dalle dai del della alle agli ai""".split()
    ),
    "lt": frozenset(
        """ir yra į iš su bet kad tai kaip o ar ne nė nei per apie po prie
        už nuo iki dar jau tik taip pat kai kur kas ką kam jis ji jie jos
        aš tu mes jūs man mane tave jam jai jiems savo šis ši šie šios tas
        ta tie tos čia ten buvo bus būti gali galima labai daug visi visos
        viskas kiekvienas tačiau todėl nes jeigu jei arba bei""".split()
    ),
    "nb": frozenset(
        """og i jeg det at en et den til er som på de med han av ikke der
        så var meg seg men ett har om vi min mitt ha hadde hun nå over da
        ved fra du ut sin dem oss opp man kan hans hvor eller hva skal selv
        sjøl her alle vil bli ble blitt kunne inn når være kom noen noe
        ville dere som deres kun ja etter ned skulle denne for deg si sine
        sitt mot å meget hvorfor dette disse uten hvordan ingen din ditt
        blir samme hvilken hvilke sånn inni mellom vår hver hvem vors
        hvis både bare enn fordi før mange også slik vært
        bak""".split()
    ),
    "pl": frozenset(
        """i w na z do że się nie jest był była było są być ma mają po o
        jak ale czy za od tak to co kto gdzie kiedy dla przez przy bez pod
        nad między ja ty on ona ono my wy oni one mnie ciebie jego jej ich
        nas was mój twój swój ten ta to te ci tamten który która które już
        jeszcze tylko bardzo może można musi wszystko wszyscy każdy żaden
        lub albo oraz a więc jednak też także gdy jeśli bo ponieważ
        będzie""".split()
    ),
    "pt": frozenset(
        """o a os as de do da dos das em no na nos nas um uma uns umas e é
        que não para por com se mais ou como mas foi são ser está estava
        ao aos à às pelo pela pelos pelas este esta estes estas esse essa
        isso isto aquele aquela eu tu ele ela nós vós eles elas me te lhe
        nosso nossa meu minha teu tua seu sua seus suas já ainda também
        muito pouco todo toda todos todas outro outra quando onde porque
        qual quais quem depois antes entre sem sobre até era ter tem têm
        tinha há houve""".split()
    ),
    "ro": frozenset(
        """și în la cu de pe un o este sunt a al ale ai că nu se ca mai dar
        sau din pentru prin după până fără sub peste între eu tu el ea noi
        voi ei ele îmi îți îi ne vă le meu mea tău ta său sa acest această
        acesta aceasta aceste acestea acel acea care ce cine când unde cum
        dacă deci totuși foarte mult puțin tot toate toți orice fiecare
        fost fi fie era avea are am ați au însă și-a s-a nu-i
        și-au""".split()
    ),
    "es": frozenset(
        """el la los las de del que y en se un una por para es con no al lo
        como más pero sus le ya o este si porque está entre cuando muy sin
        sobre también me hasta hay donde quien desde todo nos mas esta
        tambien durante todos uno les ni contra otros ese eso ante ellos e
        esto mí antes algunos qué unos yo otro otras otra él tanto esa
        estos mucho quienes nada muchos cual poco ella estar estas algunas
        algo nosotros mi mis tú te ti tu tus ellas sí son fue ser tiene
        tienen era eran estaba estaban he ha han había cada dos
        según segun""".split()
    ),
    "zh": frozenset(
        # real stopwords-iso zh entries exist, but the engine's whitespace
        # tokenizer cannot segment unspaced CJK text — kept for the rare
        # pre-segmented corpus
        "的 了 和 是 在 我 有 他 这 中 大 来 上 国 个 到 说 们 为 子 就 你 也 着 不 与 或".split()
    ),
    "ja": frozenset(
        # same caveat as zh: meaningful only on pre-segmented text
        "の に は を た が で て と し れ さ ある いる も する から な こと として".split()
    ),
    # -- tier 2 (stemmable) ------------------------------------------------
    "ar": frozenset(
        """في من على و أن إلى عن مع هذا هذه ذلك تلك التي الذي الذين ما لا
        لم لن إن كان كانت يكون أو ثم حتى إذا كل بعض غير بين قد لقد هو هي
        هم هن أنا أنت نحن كما فيه بها له لها لهم منه منها عند عندما هناك
        هنا أي بعد قبل أيضا ضد حول دون خلال منذ حيث لكن بل فقط ليس
        كانوا""".split()
    ),
    "fi": frozenset(
        """ja ei se että on oli en hän mä sä te me he ne tämä tuo joka mikä
        kun niin kuin mutta myös vain vielä jo nyt sitten siis eli tai vai
        sekä ettei jos koska vaikka mitä mitään siitä tässä tuossa siinä
        sen tätä tällä tähän ole olla ollut olivat ovat oltiin ollaan minun
        sinun hänen meidän teidän heidän mun sun mulla sulla hänellä olen
        olet olemme olette voi voidaan pitää täytyy paljon hyvin kaikki
        kaikki jotka jonka jossa josta johon""".split()
    ),
    "hu": frozenset(
        """a az és hogy nem is egy ez de van volt lesz lett csak már még
        mint el le fel meg be ki át rá ha mert vagy pedig így úgy akkor
        most itt ott én te ő mi ti ők engem téged őt minket titeket őket
        nekem neked neki nekünk nektek nekik vele velem veled velünk ebben
        abban ezt azt ennek annak erre arra ezen azon amely amelyek aki
        akik ami amik minden mindenki semmi senki valami valaki olyan
        ilyen néhány több kevés nagyon lehet kell volna lenne""".split()
    ),
    "sv": frozenset(
        """och det att i en jag hon som han på den med var sig för så till
        är men ett om hade de av icke mig du henne då sin nu har inte hans
        honom skulle hennes där min man ej vid kunde något från ut när
        efter upp vi dem vara vad över än dig kan sina här ha mot alla
        under någon eller allt mycket sedan ju denna själv detta åt utan
        varit hur ingen mitt ni bli blev oss din dessa några deras blir
        mina samma vilken er sådan vår blivit dess inom mellan sådant
        varför varje vilka ditt vem vilket sitta sådana vart dina vars
        vårt våra ert era vilkas""".split()
    ),
    # -- tier 3 (stopword-removal only) ------------------------------------
    "af": frozenset(
        """die en van in is het nie dat wat vir op aan met hy sy ek jy dit
        was as om sal kan maar hulle ons julle daar hierdie daardie wie
        waar hoe wanneer want of deur tot uit oor onder tussen teen na by
        geen baie meer al net ook nog word het'n 'n se sou moet mag gaan
        kom doen gedoen gewees""".split()
    ),
    "bg": frozenset(
        """и в на с за от да не е са бе беше бяха съм си се то това тези
        онзи тя той те ние вие аз ти го му ѝ им ме те ни ви ми кой коя кое
        кои какво къде кога как защо защото че ако или но а пък обаче само
        още вече при през след преди между под над без до около всички
        всеки някой нещо нищо много малко може трябва има няма бъде били
        бил била било съответно""".split()
    ),
    "bn": frozenset(
        """এবং ও এই যে না হয় হয়েছে ছিল করে থেকে তার তাদের আমি আমার তুমি সে
        এটা ওটা কি কী কেন কোথায় কখন কিভাবে জন্য সঙ্গে সাথে মধ্যে উপর নিচে
        আগে পরে কিন্তু বা অথবা যদি তবে তাহলে সব সকল কিছু অনেক আরও আর এক
        একটি দুই করা করতে হবে ছিলেন আছে নেই এর তা যা""".split()
    ),
    "br": frozenset(
        """ha hag an ar al en e er el da eus gant evit war dre a-raok goude
        met pe ma mar rak peogwir ne ket eo oa zo int bet bezañ hon ho hor
        o da'm da'z ni c'hwi int me te eñ hi se hemañ homañ ar re-mañ
        ar re-se piv petra pelec'h pegoulz penaos perak holl kalz nebeut
        un ul ur""".split()
    ),
    "ca": frozenset(
        """el la els les de del dels en un una uns unes i o que no es és
        són era eren per amb com més però si ja al als a mi em et li ens
        us hi ho jo tu ell ella nosaltres vosaltres ells elles aquest
        aquesta aquests aquestes aquell aquella allò això tot tots tota
        totes res algú ningú molt poc quan on perquè qui què quin quina
        sense sobre sota entre fins des d'un d'una l'ha s'ha hem han he ha
        havia tenir té fer fet ser estar està""".split()
    ),
    "cs": frozenset(
        """a i v na se že je to s z do o k по ale jako by byl byla bylo
        byly jsou být má mají měl mít už již jen ještě také taky když kde
        kdy kdo co což jak proč protože pokud aby nebo ani ne ano já ty on
        ona ono my vy oni mě tě ho jí nás vás jim můj tvůj svůj ten ta to
        ti ty tento tato toto tam tady zde tedy tak pak při pro před za
        pod nad mezi bez od u po během všechno všichni každý žádný nic
        něco někdo hodně málo může musí""".split()
    ),
    "eo": frozenset(
        """la kaj en de al ne mi vi li ŝi ĝi ni ili oni estas estis estos
        esti ke se ĉu por kun sur sub inter antaŭ post dum per pri pro el
        ĉe da ol kiel kiam kie kiu kio kial ĉi tiu tio tiuj ĉio ĉiu ĉiuj
        neniu nenio iu io iuj ankaŭ ankoraŭ jam nur tre plej pli plu sed
        aŭ do tamen ja eĉ nu jes""".split()
    ),
    "et": frozenset(
        """ja ei on oli ta see et ma sa me te nad mis kes kus millal kuidas
        miks sest kui aga või ning ka veel juba ainult siis nii nagu oma
        tema minu sinu meie teie nende seda selle need neid mul sul tal
        meil teil neil olen oled oleme olete olid olnud olla võib peab
        kõik iga mõni midagi keegi mitte ilma vahel üle alla enne pärast
        juures kohta vastu läbi""".split()
    ),
    "eu": frozenset(
        """eta da du ez bat batzuk hau hori hura hauek horiek haiek ni zu
        gu zuek bera beraiek nire zure gure bere haien baina edo ala baldin
        ba al zer nor non noiz nola zergatik zein guztia guztiak asko
        gutxi oso ere bai jada oraindik orain gero lehen artean gabe
        arte buruz kontra zehar barru kanpo izan ziren zen dira dela
        duela dituen dute dugu dut""".split()
    ),
    "fa": frozenset(
        """و در به از که این آن است بود شد می ها را با برای تا بر هم نیز یا
        اما اگر چون زیرا پس هر همه هیچ چیزی کسی من تو او ما شما آنها ایشان
        خود این‌ها آن‌ها چه چرا کجا کی چگونه چند آیا نه بله دیگر فقط هنوز
        الان اکنون سپس بین روی زیر بالای پیش بعد بدون درباره مانند مثل
        باید شاید بودند هستند هست نیست کرد کند شده باشد دارد
        داشت""".split()
    ),
    "ga": frozenset(
        """agus an na is tá bhí beidh ní go ar le do de i in ag as ó chuig
        faoi thar idir gan trí roimh tar éis mé tú sé sí muid sibh siad mo
        do a ár bhur seo sin siúd cé cad cathain cá conas cén fáth ach nó
        má dá mar toisc gach uile roinnt mórán beagán an-
        níos is ea níl nach bhfuil raibh""".split()
    ),
    "gl": frozenset(
        """o a os as de do da dos das en no na nos nas un unha uns unhas e
        é que non para por con se máis ou como pero foi son ser está ao
        aos á ás polo pola eu ti el ela nós vós eles elas me che lle noso
        nosa meu miña teu túa seu súa xa aínda tamén moito pouco todo toda
        todos todas outro outra cando onde porque cal quen despois antes
        entre sen sobre ata era ten teñen había hai""".split()
    ),
    "gu": frozenset(
        """અને છે માં થી ને નો ની નું એ આ તે હું તું અમે તમે તેઓ મારું
        તારું તેનું શું કેમ ક્યાં ક્યારે કેવી રીતે માટે સાથે વચ્ચે ઉપર
        નીચે પહેલા પછી પરંતુ અથવા જો તો બધા કેટલાક કંઈક કોઈ ઘણું વધુ હતું
        હતા હશે હોય કરે કરવું થયું થાય રહ્યું છું છો""".split()
    ),
    "ha": frozenset(
        """da a na ne ce ta wa ya su ba mu ku ni kai ke shi ita wannan
        wancan wadannan me ina yaushe yaya don domin amma ko idan to duk
        wasu wani wata abu kowa kome da yawa kadan zai za sun suka yake
        yana muna kuna nake shine sune cikin kan daga zuwa tsakanin gaban
        bayan ba tare ba sai kuma har sabon""".split()
    ),
    "he": frozenset(
        """של את על אל עם כי זה זו אלה הוא היא הם הן אני אתה את אנחנו אתם
        אתן לא כן אם או אבל גם רק עוד כבר יש אין היה הייתה היו יהיה להיות
        מה מי איפה מתי איך למה כאשר בין תחת לפני אחרי בלי עד מן ממנו ממנה
        שלי שלך שלו שלה שלנו שלכם שלהם כל כמה הרבה מעט משהו מישהו שום דבר
        אשר כך ככה אז עכשיו שם פה""".split()
    ),
    "hi": frozenset(
        """और है हैं था थी थे में से को का की के ने पर यह वह ये वे मैं तुम
        आप हम मेरा तेरा उसका हमारा क्या क्यों कहाँ कब कैसे लिए साथ बीच ऊपर
        नीचे पहले बाद लेकिन या अगर तो सब कुछ कोई बहुत अधिक और भी नहीं हाँ
        हो होता होती होते हुआ हुई हुए करना किया करता करती करते रहा रही रहे
        गया गई गए दिया जाता जाती इस उस इन उन अपना भी ही तक जब तब यहाँ वहाँ
        ऐसा वैसा""".split()
    ),
    "hr": frozenset(
        """i u na je se da su za s sa od do o kao ali ili ako jer što tko
        gdje kada kako zašto ne li bi bio bila bilo bili smo ste sam si
        ja ti on ona ono mi vi oni one me te ga ju nas vas ih moj tvoj
        svoj njegov njezin naš vaš njihov ovaj taj onaj ova ta ona ovo to
        ono svi sve svatko netko nešto ništa mnogo malo vrlo već još samo
        pa niti te a pri pod nad između bez kroz prije poslije tijekom
        biti će ću ćeš ćemo ćete može mora ima nema""".split()
    ),
    "hy": frozenset(
        """և ու է են էր էին եմ ես ենք եք չի չեն չէ այս այդ այն սա դա նա ես
        դու մենք դուք նրանք իմ քո նրա մեր ձեր նրանց ինչ ով որտեղ երբ
        ինչպես ինչու որ եթե բայց կամ ոչ այո միայն դեռ արդեն հիմա հետո
        առաջ մեջ վրա տակ միջև առանց մասին համար հետ բոլոր ամեն ինչ-որ
        շատ քիչ կա չկա լինել եղել""".split()
    ),
    "id": frozenset(
        """yang dan di ke dari untuk pada dengan dalam adalah ini itu saya
        kamu dia kami kita mereka aku engkau anda tidak bukan ya jika
        kalau karena sebab tetapi tapi atau juga sudah telah belum akan
        sedang masih hanya saja lagi pula ada tiada semua setiap beberapa
        sesuatu seseorang banyak sedikit sangat lebih paling apa siapa
        mana kapan bagaimana mengapa kenapa bila oleh antara tanpa sebelum
        sesudah setelah sejak hingga sampai tentang seperti bahwa agar
        supaya namun bisa dapat harus ialah yaitu yakni pun per bagi
        terhadap""".split()
    ),
    "ko": frozenset(
        # Korean particles attach to the word (no whitespace boundary) —
        # kept for pre-segmented corpora, same caveat as zh/ja
        "이 그 저 것 수 등 들 및 에서 그리고 하지만 또한 그러나 즉 또 더 안 못 잘".split()
    ),
    "ku": frozenset(
        """û li di bi ji bo ku ev ew ez tu em hûn ewan min te wî wê me we
        wan xwe yê ya yên na ne erê belê lê lêbelê an yan eger heke çima
        kengî çawa çi kî kû her hemû hin hinek gelek kêm pir zêde tenê
        jî hê hîn niha paşê berê navbera bê der barê wek mîna heye nîne
        bû ye in im î ne""".split()
    ),
    "la": frozenset(
        """et in est ad ut cum non sed qui quae quod a ab ex de per pro
        si ac atque aut vel nec neque enim autem ergo igitur nam quia
        quoniam dum donec quamquam etsi ego tu nos vos is ea id ille illa
        illud hic haec hoc iste ista istud meus tuus suus noster vester
        omnis totus nullus aliquis quidam multus paucus iam adhuc nunc
        tunc ibi ubi unde quo quando cur quomodo sunt erat erant fuit esse
        sit posse potest debet habet""".split()
    ),
    "lv": frozenset(
        """un ir uz no ar par pēc pirms starp bez pie kā ka jo bet vai ja
        tad tā tas šis šī tie tās es tu viņš viņa mēs jūs viņi viņas man
        tev viņam viņai mums jums viņiem mans tavs savs mūsu jūsu viņu
        kas ko kur kad kāpēc kā arī vēl jau tikai ļoti daudz maz viss visi
        katrs neviens kaut kāds nekas neviens būt bija būs esmu esi esam
        esat nav var vajag""".split()
    ),
    "mr": frozenset(
        """आणि आहे होते होता होती मध्ये पासून ला चा ची चे ने वर हे ते मी
        तू आपण आम्ही तुम्ही त्यांनी माझा तुझा त्याचा आमचा काय का कुठे
        केव्हा कसे साठी सोबत दरम्यान आधी नंतर परंतु किंवा जर तर सर्व काही
        कोणी खूप जास्त नाही होय असे तसे करणे केले करतो करते झाले होणे आता
        मग येथे तेथे हा ही त्या या""".split()
    ),
    "ms": frozenset(
        """yang dan di ke dari untuk pada dengan dalam adalah ini itu saya
        awak dia kami kita mereka aku anda tidak bukan ya jika kalau
        kerana tetapi tapi atau juga sudah telah belum akan sedang masih
        hanya sahaja lagi ada tiada semua setiap beberapa sesuatu
        seseorang banyak sedikit sangat lebih paling apa siapa mana bila
        bagaimana mengapa kenapa oleh antara tanpa sebelum selepas sejak
        hingga sampai tentang seperti bahawa agar supaya namun boleh dapat
        harus ialah iaitu pun bagi terhadap""".split()
    ),
    "no": frozenset(
        """og i jeg det at en et den til er som på de med han av ikke der
        så var meg seg men har om vi min hadde hun nå over da ved fra du
        ut sin dem oss opp man kan hans hvor eller hva skal selv her alle
        vil bli ble kunne inn når være noen noe ville dere deres kun ja
        etter ned skulle denne for deg si sine sitt mot å hvorfor dette
        disse uten hvordan ingen din blir samme hvilken sånn mellom vår
        hver hvem hvis både bare enn fordi før mange også slik vært andre
        noe""".split()
    ),
    "ru": frozenset(
        """и в во не что он на я с со как а то все она так его но да ты к
        у же вы за бы по только ее мне было вот от меня еще нет о из ему
        теперь когда даже ну вдруг ли если уже или ни быть был него до вас
        нибудь опять уж вам ведь там потом себя ничего ей может они тут
        где есть надо ней для мы тебя их чем была сам чтоб без будто чего
        раз тоже себе под будет ж тогда кто этот того потому этого какой
        совсем ним здесь этом один почти мой тем чтобы нее сейчас были
        куда зачем всех никогда можно при об хотя эта это весь вся всё""".split()
    ),
    "sk": frozenset(
        """a i v na sa že je to s z do o k ale ako by bol bola bolo boli
        sú byť má majú mal mať už len ešte tiež keď kde kedy kto čo ako
        prečo pretože ak aby alebo ani nie áno ja ty on ona ono my vy oni
        ma ťa ho jej nás vás im môj tvoj svoj ten tá to títo tieto tam tu
        teda tak potom pri pre pred za pod nad medzi bez od u po počas
        všetko všetci každý žiadny nič niečo niekto veľa málo môže
        musí""".split()
    ),
    "sl": frozenset(
        """in v na se je da so za s z od do o kot ali ampak če ker kaj kdo
        kje kdaj kako zakaj ne li bi bil bila bilo bili smo ste sem si jaz
        ti on ona ono mi vi oni one me te ga jo nas vas jih moj tvoj svoj
        njegov njen naš vaš njihov ta tisti oni to tisto vse vsi vsak
        nekdo nekaj nič veliko malo zelo že še samo pa niti ter pri pod
        nad med brez skozi pred po biti bo bom boš bomo boste lahko mora
        ima nima tudi le""".split()
    ),
    "so": frozenset(
        """iyo oo ka ku la uu ay waa in aan ma waxa waxaa wuxuu waxay kale
        kasta dhan badan yar aad buu bay baa ayaa ayuu ayay kan tan kuwa
        midka middan halkan halkaas goorma sidee maxay maxaa yaa xaggee
        immisa haddii laakiin ama mise markii markaas hadda kadib kahor
        dhexdooda bilaa ilaa qof wax dad meel si loo looma
        weli""".split()
    ),
    "st": frozenset(
        """le ho ka ya sa e o a di ba mo re u ke ena eo ena bona rona lona
        tsa wa ba ha hore empa kapa haeba hobane leha feela hape joale
        jwale mona moo neng jwang hobaneng eng mang kae tsohle bohle e
        mong ba bang ho hong haholo hanyane na ebile ntse tla ile bile
        tse tseo sena seo""".split()
    ),
    "sw": frozenset(
        """na ya wa la kwa ni za katika cha vya kama lakini au ama ikiwa
        kwamba kwa sababu hivyo basi pia tena bado sasa kisha kabla baada
        kati juu chini mbele nyuma bila hadi mpaka kuhusu mimi wewe yeye
        sisi ninyi wao huyu huyo yule hawa hao wale hii hiyo ile hizi hizo
        zile kila wote yote chochote mtu kitu mahali wakati gani nani nini
        wapi lini vipi kwa nini ndiyo hapana si yu ana alikuwa atakuwa
        kuna hakuna anaweza lazima""".split()
    ),
    "th": frozenset(
        # Thai is written unspaced — entries match only pre-segmented text
        "และ ใน ที่ เป็น การ ของ มี ได้ ให้ ไป มา จาก ถึง กับ แต่ หรือ ถ้า เพราะ จึง ก็ ไม่ ใช่ นี้ นั้น".split()
    ),
    "tl": frozenset(
        """ang ng sa na at ay mga ito iyan iyon siya ako ikaw kami tayo
        kayo sila ko mo niya namin natin ninyo nila akin iyo kanya amin
        atin inyo kanila hindi oo kung dahil pero ngunit subalit o saka
        rin din pa lang lamang ba naman daw raw nga kasi para tungkol
        bago pagkatapos habang hanggang mula noon ngayon dito diyan doon
        ano sino saan kailan paano bakit alin lahat bawat ilan marami
        kaunti may mayroon wala ralok""".split()
    ),
    "tr": frozenset(
        """ve bir bu da de için ile olarak daha çok en gibi kadar sonra
        önce ama fakat ancak veya ya ki eğer çünkü ise değil mi mı mu mü
        ben sen o biz siz onlar beni seni onu bizi sizi onları bana sana
        ona bize size onlara benim senin onun bizim sizin onların şu bu o
        şey her hiç bazı birkaç bütün tüm hep yine yalnız sadece artık
        şimdi burada orada nerede ne zaman nasıl neden niçin kim hangi
        var yok oldu olur olmak etmek yapmak idi imiş olan
        diye""".split()
    ),
    "uk": frozenset(
        """і в у не що він на я з із зі як а то все вона так його але ж
        до ти ви за би по тільки її мені було от від мене ще немає о з-за
        йому тепер коли навіть ну раптом чи якщо вже або ні бути був
        нього до вас знову вам адже там потім себе нічого їй може вони
        тут де є треба ній для ми тебе їх чим була сам щоб без ніби чого
        раз теж собі під буде тоді хто цей того тому цього який зовсім
        ним тут цьому один майже мій тим щоби неї зараз були куди навіщо
        всіх ніколи можна при про хоча ця це весь вся""".split()
    ),
    "ur": frozenset(
        """اور ہے ہیں تھا تھی تھے میں سے کو کا کی کے نے پر یہ وہ میں تم
        آپ ہم میرا تیرا اس کا ہمارا کیا کیوں کہاں کب کیسے لیے ساتھ درمیان
        اوپر نیچے پہلے بعد لیکن یا اگر تو سب کچھ کوئی بہت زیادہ نہیں ہاں
        ہو ہوتا ہوتی ہوتے ہوا ہوئی ہوئے کرنا کیا کرتا کرتی کرتے رہا رہی
        رہے گیا گئی گئے دیا جاتا جاتی ان کا اپنا بھی ہی تک جب تب یہاں
        وہاں ایسا ویسا""".split()
    ),
    "vi": frozenset(
        """và của là có trong được cho với không này đó các những một hai
        để khi thì mà ở lại nếu vì do bởi nhưng hoặc hay cũng đã sẽ đang
        còn chỉ rất hơn nhất như thế nào gì ai đâu bao giờ sao tại vì sao
        tôi bạn anh chị em chúng ta họ nó mình tất cả mọi mỗi vài nhiều ít
        trên dưới trước sau giữa ngoài ngoại trừ về từ đến tới là gì phải
        nên cần muốn làm bị nữa rồi đây kia ấy""".split()
    ),
    "yo": frozenset(
        """ati ni si ti wa ní sí tí àti pẹ̀lú fún lori nípa ṣùgbọ́n tàbí bí
        nítorí pé kí ni mo ìwọ òun àwa ẹ̀yin wọ́n èmi rẹ̀ wa yín mi o a e
        won yi yìí náà wònyí kìnní kí ni ibo nígbà wo báwo èéṣe gbogbo
        olúkúlùkù diẹ̀ púpọ̀ kò sí ṣe jẹ́ ní í yóò ti ń máa lè gbọ́dọ̀
        sibẹ̀ báyìí lẹ́hìn kí tó""".split()
    ),
    "zu": frozenset(
        """na ku nga ngo la le lo ya yo wa wo za zo ka ko ukuthi ukuba uma
        ngoba kodwa noma futhi njalo manje lapho kanye phakathi phezulu
        phansi ngaphambi emva ngaphandle kuze kuba mina wena yena thina
        nina bona ami akho akhe ethu enu abo lowo leso lokhu lokho konke
        wonke yonke abanye okunye into umuntu indawo isikhathi ngubani
        yini kuphi nini kanjani kungani yebo cha akukho kukhona
        kufanele""".split()
    ),
}


def stopwords_for(code_or_name: str) -> frozenset[str]:
    """Stopword set for a language (empty when none is registered — the
    reference's ``stopwords(language) != set()`` probe at
    data_utils.py:745-752 has the same no-stopwords degrade)."""
    spec = spec_for(code_or_name)
    if spec.code == "en":
        from wikirec_ray.stages.analyze import DEFAULT_STOPWORDS

        return DEFAULT_STOPWORDS
    return STOPWORDS_BY_LANG.get(spec.code, frozenset())
