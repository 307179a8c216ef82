package graft.tools

import java.io.{BufferedWriter, File, FileWriter}

/** Deterministic generator for a Divvy-Bikeshare-shaped corpus at the
  * reference benchmark's scale (clojure/tests/bench/divvy.load:1-3 +
  * Makefile:83-97: three summer-2023 monthly trip files named
  * `YYYYMM-divvy-tripdata.csv`, ≈2.2M rows / ≈450 MB total, loaded via
  * `ALL FILENAMES MATCHING` with `skip header` and optionally-quoted
  * fields). Row counts mirror the real 2023 files (June 719,618 /
  * July 767,650 / August 771,693 = 2,258,961 trips); bytes/row lands
  * the same ~200 B via full-precision coordinates and station names.
  *
  * Shape quirks the real corpus exercises and this one reproduces:
  * a header line per file, ~12% electric-bike rows with EMPTY station
  * name/id fields, station names containing commas (quoted), and
  * mixed member/casual riders.
  *
  * Plain sequential writes, fixed seed: the corpus is a benchmark
  * fixture, not data under test — identical bytes on every run.
  */
object DivvyGen {

  private val streets = Array("Clark", "Halsted", "Lincoln", "Damen",
    "Ashland", "Western", "Kedzie", "Milwaukee", "Broadway", "State",
    "Wabash", "Michigan", "Clinton", "Canal", "Wells", "Franklin",
    "LaSalle", "Dearborn", "Sheffield", "Racine", "Morgan", "Loomis",
    "Paulina", "Wood", "Leavitt", "Oakley", "Campbell", "Rockwell",
    "Sacramento", "Albany", "Kimball", "Pulaski")
  private val cross = Array("Elm St", "Oak St", "Division St",
    "North Ave", "Armitage Ave", "Fullerton Ave", "Diversey Pkwy",
    "Belmont Ave", "Addison St", "Irving Park Rd", "Montrose Ave",
    "Lawrence Ave", "Foster Ave", "Bryn Mawr Ave", "Madison St",
    "Monroe St", "Adams St", "Jackson Blvd", "Van Buren St",
    "Harrison St", "Roosevelt Rd", "Cermak Rd", "31st St", "35th St")

  private val hex = "0123456789ABCDEF".toCharArray

  def main(args: Array[String]): Unit = {
    val outDir = new File(if (args.nonEmpty) args(0) else "/tmp/divvy")
    outDir.mkdirs()
    val months = Array((202306, 30, 719618), (202307, 31, 767650),
      (202308, 31, 771693))
    // one station pool shared by the three files, like the real system;
    // ~8% of names carry a comma and arrive quoted
    val nStations = 1200
    val names = new Array[String](nStations)
    val lats = new Array[Double](nStations)
    val lngs = new Array[Double](nStations)
    var seed = 0x9e3779b97f4a7c15L
    def next(): Long = {
      seed += 0x9e3779b97f4a7c15L
      var z = seed
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(n: Int): Int = (Math.floorMod(next(), n.toLong)).toInt
    for (i <- 0 until nStations) {
      val s = streets(nextInt(streets.length))
      val c = cross(nextInt(cross.length))
      names(i) =
        if (i % 12 == 0) "\"" + s + " St (Temp, Relocated) & " + c + "\""
        else s + " St & " + c
      lats(i) = 41.78 + nextInt(340000) / 1000000.0
      lngs(i) = -87.78 + nextInt(280000) / 1000000.0
    }

    val t0 = System.nanoTime()
    var totalRows = 0L
    for ((ym, days, rows) <- months) {
      val w = new BufferedWriter(new FileWriter(
        new File(outDir, s"$ym-divvy-tripdata.csv")), 1 << 20)
      w.write("ride_id,rideable_type,started_at,ended_at," +
        "start_station_name,start_station_id,end_station_name," +
        "end_station_id,start_lat,start_lng,end_lat,end_lng," +
        "member_casual\n")
      val year = ym / 100
      val month = ym % 100
      val sb = new java.lang.StringBuilder(256)
      var r = 0
      while (r < rows) {
        sb.setLength(0)
        var id = next()
        var k = 0
        while (k < 16) { sb.append(hex((id & 15).toInt)); id >>>= 4; k += 1 }
        val electric = nextInt(100) < 45
        sb.append(if (electric) ",electric_bike,"
                  else if (nextInt(100) < 2) ",docked_bike,"
                  else ",classic_bike,")
        val day = 1 + nextInt(days)
        val startSec = nextInt(86400 - 4000)
        val dur = 120 + nextInt(3600)
        def ts(sec: Int): Unit = {
          sb.append(f"$year%04d-$month%02d-$day%02d ")
          sb.append(f"${sec / 3600}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d")
        }
        ts(startSec); sb.append(','); ts(startSec + dur)
        val a = nextInt(nStations)
        val b = nextInt(nStations)
        // electric bikes may start/end away from a dock: empty
        // station name/id, coarse coordinates — the real files' shape
        if (electric && nextInt(100) < 27) {
          sb.append(",,,,,")
          sb.append((lats(a) * 100).round / 100.0).append(',')
          sb.append((lngs(a) * 100).round / 100.0).append(',')
          sb.append((lats(b) * 100).round / 100.0).append(',')
          sb.append((lngs(b) * 100).round / 100.0)
        } else {
          sb.append(',').append(names(a))
          sb.append(",TA").append(100000 + a)
          sb.append(',').append(names(b))
          sb.append(",TA").append(100000 + b).append(',')
          sb.append(f"${lats(a)}%.6f,${lngs(a)}%.6f,")
          sb.append(f"${lats(b)}%.6f,${lngs(b)}%.6f")
        }
        sb.append(if (nextInt(100) < 64) ",member\n" else ",casual\n")
        w.write(sb.toString)
        r += 1
      }
      w.close()
      totalRows += rows
      println(s"[divvy-gen] $ym-divvy-tripdata.csv: $rows rows")
    }
    println(f"[divvy-gen] total $totalRows rows in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
