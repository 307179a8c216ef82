package graft.tools

import java.io.{BufferedWriter, File, FileWriter}

/** Deterministic generator for an employees-shaped corpus at the
  * reference benchmark's exact scale (clojure/tests/bench/Makefile +
  * report.py:12-14: the MySQL `employees` sample database, 3.92M rows /
  * ~135 MB, mixed int/date/varchar): departments 9, employees 300,024,
  * dept_emp 331,603, dept_manager 24, titles 443,308, salaries
  * 2,844,047 — total 3,919,015 rows, matching the real dataset's
  * per-table counts. Salaries is split into four files, mirroring the
  * reference's load_salaries1-3.dump split (and giving the loader the
  * same multi-writer parallelism the reference gets from workers=4).
  *
  * Plain sequential writes, fixed seed: the corpus is a benchmark
  * fixture, not data under test — identical bytes on every run.
  */
object EmployeesGen {

  private val firstNames = Array("Georgi", "Bezalel", "Parto", "Chirstian",
    "Kyoichi", "Anneke", "Tzvetan", "Saniya", "Sumant", "Duangkaew",
    "Mary", "Patricio", "Eberhardt", "Berni", "Guoxiang", "Kazuhito")
  private val lastNames = Array("Facello", "Simmel", "Bamford", "Koblick",
    "Maliniak", "Preusig", "Zielinski", "Kalloufi", "Peac", "Piveteau",
    "Sluis", "Bridgland", "Terkki", "Genin", "Nooteboom", "Cappelletti")
  private val titles = Array("Senior Engineer", "Staff", "Engineer",
    "Senior Staff", "Assistant Engineer", "Technique Leader", "Manager")

  private val EMPLOYEES = 300024
  private val SECOND_DEPT = 31579   // dept_emp    = 331,603
  private val SECOND_TITLE = 143284 // titles      = 443,308
  private val EXTRA_SALARY = 143831 // salaries    = 2,844,047 (9 or 10 each)

  private def date(y: Int, m: Int, d: Int): String =
    f"$y%04d-${m + 1}%02d-${d + 1}%02d"

  def main(args: Array[String]): Unit = {
    val outDir = new File(if (args.nonEmpty) args(0) else "/tmp/employees")
    outDir.mkdirs()
    def writer(name: String) =
      new BufferedWriter(new FileWriter(new File(outDir, name)), 1 << 20)

    val t0 = System.nanoTime()
    val dep = writer("departments.csv")
    val deptNames = Array("Marketing", "Finance", "Human Resources",
      "Production", "Development", "Quality Management", "Sales",
      "Research", "Customer Service")
    for (i <- 0 until 9) dep.write(f"d${i + 1}%03d,${deptNames(i)}\n")
    dep.close()

    val dm = writer("dept_manager.csv")
    for (i <- 0 until 24) {
      val empNo = 110001 + i * 37
      dm.write(f"$empNo,d${i % 9 + 1}%03d," +
        s"${date(1985 + i % 10, i % 12, i % 28)},9999-01-01\n")
    }
    dm.close()

    val emp = writer("employees.csv")
    val de = writer("dept_emp.csv")
    val ti = writer("titles.csv")
    val sal = Array.tabulate(4)(i => writer(s"salaries${i + 1}.csv"))
    val rnd = new java.util.Random(20260814L)
    var i = 0
    while (i < EMPLOYEES) {
      val empNo = 10001 + i
      val birth = date(1952 + rnd.nextInt(14), rnd.nextInt(12), rnd.nextInt(28))
      val hireY = 1985 + rnd.nextInt(15)
      val hire = date(hireY, rnd.nextInt(12), rnd.nextInt(28))
      val fn = firstNames(rnd.nextInt(firstNames.length))
      val ln = lastNames(rnd.nextInt(lastNames.length))
      val g = if (rnd.nextBoolean()) "M" else "F"
      emp.write(s"$empNo,$birth,$fn,$ln,$g,$hire\n")

      val dept = f"d${rnd.nextInt(9) + 1}%03d"
      de.write(s"$empNo,$dept,$hire,9999-01-01\n")
      if (i < SECOND_DEPT) {
        val d2 = f"d${(i % 8) + (if (dept == f"d${(i % 8) + 1}%03d") 2 else 1)}%03d"
        de.write(s"$empNo,$d2,${date(hireY + 3, i % 12, i % 28)},9999-01-01\n")
      }

      val t1 = titles(rnd.nextInt(titles.length))
      ti.write(s"$empNo,$t1,$hire,9999-01-01\n")
      if (i < SECOND_TITLE)
        ti.write(s"$empNo,$t1 II,${date(hireY + 5, i % 12, i % 28)}," +
          "9999-01-01\n")

      val raises = 9 + (if (i < EXTRA_SALARY) 1 else 0)
      val w = sal(i & 3)
      var base = 38000 + rnd.nextInt(42000)
      var r = 0
      while (r < raises) {
        w.write(s"$empNo,${base + r * (500 + rnd.nextInt(3000))}," +
          s"${date(hireY + r, i % 12, i % 28)}," +
          s"${if (r == raises - 1) "9999-01-01" else date(hireY + r + 1, i % 12, i % 28)}\n")
        r += 1
      }
      i += 1
    }
    emp.close(); de.close(); ti.close(); sal.foreach(_.close())
    val bytes = outDir.listFiles().map(_.length()).sum
    println(f"generated ${outDir.getAbsolutePath} " +
      f"(${bytes / 1048576.0}%.1f MB) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
