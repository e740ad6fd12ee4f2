package graft.pipeline

import org.apache.spark.sql.SparkSession

/** SQL-facing UDF registration of the image scalar ops (the "UDF
  * surface" of SURVEY.md §2-B: the image ops are deliberately the only
  * UDF-shaped functions in the engine; relational queries stay on
  * codegen'd built-ins). All take (data BINARY, h INT, w INT, c INT)
  * plus op parameters and return BINARY, so they compose in SQL:
  *
  *   SELECT img_jpeg(img_jitter(img_resize(data, h, w, c, 224, 224),
  *                              224, 224, c, 1.2, 10.0),
  *                   224, 224, c, 0.95) FROM images
  */
object ImageUDFs {

  def register(spark: SparkSession): Unit = {
    spark.udf.register("img_resize",
      (d: Array[Byte], h: Int, w: Int, c: Int, th: Int, tw: Int) =>
        ImageOps.resizeArea(ImageRecord("udf", h, w, c, 16, d), tw, th).data)

    spark.udf.register("img_flip",
      (d: Array[Byte], h: Int, w: Int, c: Int, hor: Boolean, ver: Boolean) =>
        ImageOps.flip(ImageRecord("udf", h, w, c, 16, d), hor, ver).data)

    spark.udf.register("img_rotate",
      (d: Array[Byte], h: Int, w: Int, c: Int, deg: Double) =>
        ImageOps.rotate(ImageRecord("udf", h, w, c, 16, d), deg).data)

    spark.udf.register("img_jitter",
      (d: Array[Byte], h: Int, w: Int, c: Int, alpha: Double, beta: Double) =>
        ImageOps.colorJitter(ImageRecord("udf", h, w, c, 16, d), alpha, beta).data)

    spark.udf.register("img_jpeg",
      (d: Array[Byte], h: Int, w: Int, c: Int, q: Double) =>
        ImageOps.jpegEncode(ImageRecord("udf", h, w, c, 16, d), q.toFloat))

    spark.udf.register("img_tensor_chw",
      (d: Array[Byte], h: Int, w: Int, c: Int) =>
        ImageOps.toTensorCHW(ImageRecord("udf", h, w, c, 16, d)))
  }
}
