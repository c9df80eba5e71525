package graft.apps

import org.apache.spark.sql.types._

/** Canonical schema + constants of the reference's apps table.
  *
  * Sources (all /root/reference):
  *   - canonical column order: consumer.py:35-44
  *   - training cast map: spark_script.py:32-36
  *   - serving cast map: app.py:118-124
  *   - final API projection: spark_script.py:136-140
  *   - STOP_WORDS: app.py:81-90
  *   - GENRE_TO_ICON_MAP: producer.py:17-31
  */
object AppSchema {

  /** Canonical column order the consumer enforces on every batch CSV
    * (consumer.py:35-44). Unknown extra columns are appended after
    * these, missing ones are null-filled — see CsvIngest.enforceOrder. */
  val canonicalColumns: Seq[String] = Seq(
    "appId", "title", "genre", "score", "minInstalls", "price", "developer",
    "developerId", "reviews", "currency", "genreId", "icon", "headerImage",
    "screenshots", "video", "videoImage", "contentRating",
    "contentRatingDescription", "adSupported", "containsAds",
    "inAppPurchases", "editorsChoice", "released", "lastUpdatedOn",
    "version", "privacyPolicy", "summary", "description",
    "minAndroidVersion", "maxInstalls",
    "icon_path", "icon_category_assigned")

  /** Everything is ingested as strings (inferSchema=False,
    * spark_script.py:168) then selectively cast — §1.2. */
  def allStringSchema(cols: Seq[String]): StructType =
    StructType(cols.map(c => StructField(c, StringType, nullable = true)))

  /** Training-side cast map (spark_script.py:32-36). */
  val trainingCastMap: Map[String, DataType] = Map(
    "score" -> DoubleType, "minInstalls" -> LongType, "price" -> DoubleType,
    "img_avg_red" -> FloatType, "img_avg_green" -> FloatType,
    "img_avg_blue" -> FloatType,
    "img_width" -> IntegerType, "img_height" -> IntegerType)

  /** Serving-side cast map (app.py:118-124) — note score is FLOAT here
    * vs DOUBLE on the training side; the drift is part of the reference's
    * observable behavior and preserved. */
  val servingCastMap: Map[String, DataType] = Map(
    "title" -> StringType, "appId" -> StringType, "genre" -> StringType,
    "score" -> FloatType, "minInstalls" -> LongType, "price" -> DoubleType,
    "PredictedRating" -> FloatType, "cluster" -> IntegerType,
    "img_avg_red" -> FloatType, "img_avg_green" -> FloatType,
    "img_avg_blue" -> FloatType,
    "img_width" -> IntegerType, "img_height" -> IntegerType)

  /** Final ≤12-column API projection (spark_script.py:136-140). */
  val finalApiColumns: Seq[String] = Seq(
    "appId", "title", "genre", "score", "minInstalls", "price",
    "icon_path", "cluster", "PredictedRating",
    "img_avg_red", "img_avg_green", "img_avg_blue")

  /** Keyword-extraction stop words (app.py:81-90, 74 entries). */
  val stopWords: Set[String] = Set(
    "a", "an", "the", "is", "are", "was", "were", "of", "and", "or", "in",
    "on", "at", "to", "for", "with", "by", "from", "as", "it", "this",
    "that", "app", "apps", "hd", "pro", "free", "new", "android", "mobile",
    "online", "offline", "edition", "version", "official", "ultimate",
    "lite", "plus", "super", "real", "my", "best", "top", "big", "small",
    "all", "very", "just", "full", "no", "not", "yes", "fps", "rpg", "p",
    "o", "s", "vs", "vs.", "x", "2d", "3d", "update", "jan", "feb", "mar",
    "apr", "may", "jun", "jul", "aug", "sep", "oct", "nov", "dec", ":",
    "-", "&", "+", ",", ".", "!", "?", "'", "\"", "(", ")", "–",
    "™", "®")

  /** Genre → icon-category candidates (producer.py:17-31). */
  val genreToIconMap: Map[String, Seq[String]] = Map(
    "Tools" -> Seq("blade", "clock", "disk"),
    "Productivity" -> Seq("books", "building", "envelope", "clock"),
    "Business" -> Seq("building", "disk", "envelope"),
    "Finance" -> Seq("building", "disk"),
    "Entertainment" -> Seq("emotion_face", "ball", "biking", "bunny_ears"),
    "Games" -> Seq("ball", "biking", "cartwheeling", "blade", "feline"),
    "Music & Audio" -> Seq("disk", "emotion_face"),
    "Health & Fitness" -> Seq("biking", "drinks"),
    "Shopping" -> Seq("disk", "flag"),
    "Communication" -> Seq("envelope", "emotion_face", "family"),
    "Social" -> Seq("family", "emotion_face"),
    "Education" -> Seq("books", "building", "arrow_directions"),
    "Books & Reference" -> Seq("books", "envelope"),
    "Travel & Local" -> Seq("airplane", "boat", "fast_train", "flag", "building"),
    "Maps & Navigation" -> Seq("arrow_directions", "flag", "airplane"),
    "default" -> Seq("arrow_directions", "cloud", "disk", "flag"))
}
